# render a trained LLFF NeRF (parity: reference scripts/test_llff.sh)
dataset=${1:-fern}
root=${2:-./data/nerf_llff_data/$dataset}
python test.py --name llff-$dataset --dataset_mode llff \
  --dataset_root $root --img_wh 504 378 --model nerf \
  --N_coarse 64 --N_importance 64 --load_epoch 30 --test_split test_train
