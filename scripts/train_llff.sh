# vanilla NeRF on an LLFF scene (parity: reference scripts/train_llff.sh)
dataset=${1:-fern}
root=${2:-./data/nerf_llff_data/$dataset}
python train.py --name llff-$dataset --dataset_mode llff --dataset_root $root \
  --img_wh 504 378 --batch_size 2048 --n_epochs 30 --n_epochs_decay 10 \
  --model nerf --N_coarse 64 --N_importance 64 \
  --lr_policy exp --sigma_activation relu --lr 5e-4 --lr_final 5e-6 \
  --use_pallas_mlp --scan_steps 20
