# render a trained blender supersampling model
dataset=${1:-lego}
root=${2:-./data/nerf_synthetic/$dataset}
python test.py --name blender-down2-$dataset --dataset_mode blender_downX \
  --dataset_root $root --img_wh 200 200 --downscale 2 --model nerf_downX \
  --N_coarse 64 --N_importance 64 --load_epoch 20 --test_split test
