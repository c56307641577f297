# render a trained blender NeRF (parity: reference scripts/test_blender.sh
# — trains at 200x200, tests at 400x400)
dataset=${1:-lego}
root=${2:-./data/nerf_synthetic/$dataset}
python test.py --name blender-$dataset --dataset_mode blender \
  --dataset_root $root --img_wh 400 400 --model nerf \
  --N_coarse 64 --N_importance 64 --load_epoch 20 --test_split test
