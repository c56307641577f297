# refinement stage (parity: reference scripts/train_llff_refine.sh)
dataset=${1:-fern}
root=${2:-./data/nerf_llff_data/$dataset}
syn=${3:-./results/nerf-sr/llff-${dataset}-378x504-ni64-ds2/test_train_30}
python warp.py --dataset_root $root --result_dir $syn --img_wh 504 378
python train_refine.py --name llff-refine-$dataset --dataset_mode llff_refine \
  --dataset_root $root --img_wh 504 378 --batch_size 32 --model refine \
  --n_epochs 3 --n_epochs_decay 0 --lr_policy exp --lr 5e-4 --lr_final 5e-6 \
  --print_freq 100 --vis_freq 1000 --val_freq 1000 \
  --save_epoch_freq 1 --val_epoch_freq 1 \
  --syn_dataroot $syn --refine_with_l1
