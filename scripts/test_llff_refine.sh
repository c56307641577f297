# refinement test (parity: reference scripts/test_llff_refine.sh).
# NOTE: the reference script passes --refine_network maxpoolingmodel
# while its train script used the unet default - a checkpoint/arch
# mismatch; here the network defaults to the one that was trained.
dataset=${1:-fern}
root=${2:-./data/nerf_llff_data/$dataset}
syn=${3:-./results/nerf-sr/llff-${dataset}-378x504-ni64-ds2/test_train_30}
python test_refine.py --name llff-refine-$dataset --dataset_mode llff_refine \
  --dataset_root $root --img_wh 504 378 --batch_size 1 --model refine \
  --test_split test_train --load_epoch 3 \
  --syn_dataroot $syn
