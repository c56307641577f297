# render + emit refinement artifacts from a trained downX checkpoint
dataset=${1:-fern}
root=${2:-./data/nerf_llff_data/$dataset}
python test.py --name llff-${dataset}-378x504-ni64-ds2 \
  --dataset_mode llff_downX --dataset_root $root \
  --checkpoints_dir ./checkpoints/nerf-sr --results_dir ./results/nerf-sr \
  --img_wh 504 378 --model nerf_downX --N_coarse 64 --N_importance 64 \
  --downscale 2 --load_epoch 30 --test_split test_train
