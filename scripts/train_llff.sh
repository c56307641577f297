# vanilla NeRF on an LLFF scene (parity: reference scripts/train_llff.sh;
# 252x189 inputs, reference cadence flags)
dataset=${1:-fern}
root=${2:-./data/nerf_llff_data/$dataset}
python train.py --name llff-$dataset --dataset_mode llff --dataset_root $root \
  --img_wh 252 189 --batch_size 2048 --n_epochs 30 --n_epochs_decay 10 \
  --print_freq 100 --vis_freq 1000 --val_freq 1000 \
  --vis_epoch_freq 30 --val_epoch_freq 30 --save_epoch_freq 10 \
  --model nerf --N_coarse 64 --N_importance 64 \
  --lr_policy exp --sigma_activation relu --lr 5e-4 --lr_final 5e-6 \
  --scan_steps 20
