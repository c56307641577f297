"""Configuration / CLI.

The reference builds its flag set dynamically by asking each chosen
model/dataset/network/embedding class for flags (``options/base_options.py:
76-101``). Here the full flag surface is declared once, flat, with the SAME
names and defaults, so the shell scripts in the reference's ``scripts/``
directory work verbatim against our ``train.py``/``test.py``. Per-dataset
default overrides (blender: white_bkgd=True noise_std=0; llff*: white_bkgd=
False noise_std=1 — ``data/blender_dataset.py:15``, ``data/llff_dataset.py:
174``) are applied after parsing.

TPU-specific additions are grouped at the bottom (``--precision``,
``--mesh_devices``, ...).
"""

from __future__ import annotations

import argparse
import json
import os


# --fast_preset expansions: the validated config ladder (STATUS.md; every
# entry quality-proven on paired full-schedule runs across the synthetic
# benchmark scene families — see README "Choosing a config"). The
# reference encodes its per-family configs as shell scripts
# (scripts/train_llff_downX.sh:1-19 vs train_blender_downX.sh:1-15);
# presets are that surface as first-class flags, with the scene-family
# scoping the round-4 blender bracket measured (the LLFF primary loses
# 7.2 dB on 360-degree white-bkgd scenes).
FAST_PRESETS = {
    # forward-facing (LLFF/NDC) scenes ONLY: NI=16 slim two-round
    # proposal + pad anneal + slim prop net. ~1.6M rays/s/chip on the
    # v5e (~17x parity); at-or-above parity PSNR/SSIM on the textured,
    # cluttered, specular, and textured+specular families x both seeds.
    "llff": dict(fast_sampling=True, N_importance=16, n_prop=48,
                 n_prop_levels=2, n_prop2=24, prop_pad_anneal_frac=0.5,
                 prop_pad_final=0.0, prop_W=48, prop_D=3),
    # LLFF quality headroom: NI=24 slim (constant pad). ~1.1M rays/s
    # (~12x parity); BEATS parity on every LLFF family/seed pairing.
    "quality": dict(fast_sampling=True, N_importance=24, n_prop=48,
                    n_prop_levels=2, n_prop2=24, prop_W=48, prop_D=3),
    # 360-degree/white-bkgd (blender) scenes: NI=48 two-round 96+48,
    # CONSTANT pad (empty/silhouette rays need the uniform CDF floor
    # permanently), default W64/D4 prop net. ~4.5x parity at -0.2..-0.4
    # dB on blender x4; also at-or-above parity on LLFF (~3.9x there).
    "blender": dict(fast_sampling=True, N_importance=48, n_prop=96,
                    n_prop_levels=2, n_prop2=48),
    # scene-family-agnostic: identical flags to 'blender' (the NI=48
    # two-round config is the best pick that is safe everywhere).
    "universal": dict(fast_sampling=True, N_importance=48, n_prop=96,
                      n_prop_levels=2, n_prop2=48),
    # the reference's exact coarse+fine sampling (no proposal MLP).
    "parity": dict(fast_sampling=False),
}


def str2bool(v):
    """Parity: ``options/__init__.py:23-31``."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def build_parser(phase: str) -> argparse.ArgumentParser:
    # allow_abbrev=False: the explicit-flag detection that keeps user
    # flags above dataset defaults / presets compares argv spellings
    # against flag dests — an argparse prefix abbreviation
    # (--N_import for --N_importance) would parse but then lose to the
    # preset value silently. Full flag names only.
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        allow_abbrev=False)

    # ---- base options (options/base_options.py:35-74) ----
    p.add_argument("--accelerator", type=str, default="dp",
                   choices=["dp", "ddp"],
                   help="compat no-op: both map to the jax device mesh")
    p.add_argument("--name", type=str, required=True)
    p.add_argument("--checkpoints_dir", type=str, default="./checkpoints")
    p.add_argument("--ckpt_backend", type=str, default="msgpack",
                   choices=["msgpack", "orbax"],
                   help="checkpoint serialization: msgpack = atomic "
                        "single-file flax blobs (default); orbax = "
                        "async background writes ({epoch}_state.orbax/ "
                        "directories) so training never stalls on "
                        "checkpoint IO. Resume reads either format.")
    p.add_argument("--summary_dir", type=str, default="./runs")
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--model", type=str, default="template")
    p.add_argument("--init_type", type=str, default="kaiming")
    p.add_argument("--init_gain", type=float, default=0.02)
    p.add_argument("--dataset_mode", type=str, default="template")
    p.add_argument("--dataset_root", type=str, required=True)
    p.add_argument("--sisr_path", type=str, default=None)
    p.add_argument("--num_threads", type=int, default=4,
                   help="compat no-op: no host DataLoader workers exist; "
                        "batches are sampled on device")
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--eval_batch_size", type=int, default=1,
                   help="compat no-op: eval renders whole images with "
                        "fixed-shape device chunks (--ray_chunk)")
    p.add_argument("--max_dataset_size", type=float, default=float("inf"))
    p.add_argument("--img_wh", type=int, nargs=2, required=True)
    p.add_argument("--use_pixel_centers", type=str2bool, default=True)
    p.add_argument("--patch_size", type=int, default=1)
    p.add_argument("--phase", type=str, default=phase,
                   choices=["train", "test", "infer"])
    p.add_argument("--load_epoch", type=str, default="latest")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--suffix", default="", type=str)
    p.add_argument("--ray_chunk", type=int, default=4096,
                   help="host-level eval chunk (training never chunks)")
    p.add_argument("--point_chunk", type=int, default=2048 * 128,
                   help="compat no-op on TPU: the MLP batch is never split")

    if phase == "train":
        # ---- train options (options/train_options.py) ----
        p.add_argument("--print_freq", type=int, default=10)
        p.add_argument("--vis_freq", type=int, default=10)
        p.add_argument("--vis_epoch_freq", type=int, default=5)
        p.add_argument("--val_freq", type=int, default=10)
        p.add_argument("--val_epoch_freq", type=int, default=1)
        p.add_argument("--save_epoch_freq", type=int, default=1)
        p.add_argument("--continue_train", action="store_true")
        p.add_argument("--init_weights", type=str, default=None)
        p.add_argument("--init_weights_keys", type=str, default=".+")
        p.add_argument("--fix_layers", type=str, default=None)
        p.add_argument("--precrop_frac", type=float, default=0.5)
        p.add_argument("--keep_last", action="store_true",
                       help="count the final partial batch in the epoch "
                            "(reference train.py:39)")
        p.add_argument("--train_split", type=str, default="train")
        p.add_argument("--val_split", type=str, default="val")
        p.add_argument("--val_epoch_split", type=str, default="test_train")
    else:
        # ---- test options (options/test_options.py) ----
        p.add_argument("--results_dir", type=str, default="./results/")
    p.add_argument("--test_split", type=str, default="test")

    # optimizer hyperparameters are needed in BOTH phases: checkpoint
    # restore rebuilds the optimizer-state pytree structure at load time
    # (unlike the reference, we checkpoint adam moments too).
    p.add_argument("--n_epochs", type=int, default=20)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--lr_policy", type=str, default="exp")
    p.add_argument("--lr_final", type=float, default=5e-6)
    p.add_argument("--n_epochs_decay", type=int, default=10)
    p.add_argument("--lr_decay_epochs", type=int, default=10)
    p.add_argument("--lr_decay_gamma", type=float, default=0.1)
    p.add_argument("--grad_clip_val", type=float, default=0)
    p.add_argument("--grad_clip_type", type=str, default="norm",
                   choices=["norm", "value"])

    # ---- nerf model options (models/nerf_model.py:42-72) ----
    p.add_argument("--mlp_network", type=str, default="vanilla_mlp")
    p.add_argument("--embedding", type=str, default="positional_encoding",
                   choices=["positional_encoding"],
                   help="embedding registry name (the reference ships "
                        "only PositionalEncoding, models/embedding.py:14"
                        "-63, so other values are rejected loudly)")
    p.add_argument("--N_coarse", type=int, default=64)
    p.add_argument("--N_importance", type=int, default=64)
    p.add_argument("--lindisp", action="store_true")
    p.add_argument("--noise_std", type=float, default=0.0)
    p.add_argument("--white_bkgd", action="store_true", default=None)
    p.add_argument("--randomized", type=str2bool, default=True)
    p.add_argument("--dim_rgb", type=int, default=3)
    p.add_argument("--dim_pos", type=int, default=3)
    p.add_argument("--dim_dir", type=int, default=3)
    p.add_argument("--deg_pos", type=int, default=10)
    p.add_argument("--deg_dir", type=int, default=4)
    p.add_argument("--lambda_coarse_mse", type=float, default=1.0)
    p.add_argument("--lambda_fine_mse", type=float, default=1.0)
    p.add_argument("--lambda_coarse_depth_lap", type=float, default=0.0)
    p.add_argument("--lambda_fine_depth_lap", type=float, default=0.0)
    p.add_argument("--lambda_coarse_vgg", type=float, default=0.0)
    p.add_argument("--lambda_fine_vgg", type=float, default=0.0)
    p.add_argument("--color_activation", type=str, default="sigmoid",
                   choices=["none", "sigmoid"])
    p.add_argument("--sigma_activation", type=str, default="relu",
                   choices=["relu", "softplus"])
    p.add_argument("--bilateral_gamma", type=float, default=0.1)
    p.add_argument("--with_ref", action="store_true")
    p.add_argument("--no_ref_loss", action="store_true")
    p.add_argument("--downscale", type=int, default=2)

    # ---- embedding options (models/embedding.py:16-19) ----
    p.add_argument("--no_xyz", action="store_true")
    p.add_argument("--no_logscale", action="store_true")

    # ---- vanilla_mlp options (models/networks.py:122-129) ----
    p.add_argument("--D", type=int, default=8)
    p.add_argument("--W", type=int, default=256)
    p.add_argument("--skips", type=int, nargs="+", default=[4])
    p.add_argument("--stop_grad", type=str2bool, default=False)
    p.add_argument("--no_dir", action="store_true")

    # ---- nerf_downX model options (models/nerf_downX_model.py:106-130) ----
    p.add_argument("--use_var_loss", action="store_true")
    p.add_argument("--lambda_coarse_var", type=float, default=0.01)
    p.add_argument("--lambda_fine_var", type=float, default=0.01)
    p.add_argument("--use_depth_var_loss", action="store_true")
    p.add_argument("--lambda_coarse_depth_var", type=float, default=0.01)
    p.add_argument("--lambda_fine_depth_var", type=float, default=0.01)
    p.add_argument("--ds_method", type=str, default="lanc",
                   choices=["avg", "lanc"])
    p.add_argument("--with_sr", action="store_true",
                   help="compat no-op: dead flag in the reference too "
                        "(SISR supervision is gated by --sisr_path)")
    p.add_argument("--with_netD", action="store_true")
    p.add_argument("--dis_network", type=str, default="nlayerdiscriminator")
    p.add_argument("--patch_len", type=int, default=32)
    p.add_argument("--lambda_L1", type=float, default=100.0)
    p.add_argument("--lambda_gan", type=float, default=0.005)
    p.add_argument("--use_grad", action="store_true")
    p.add_argument("--gan_lr", type=float, default=5e-4)
    p.add_argument("--gan_mode", type=str, default="vanilla",
                   choices=["vanilla", "lsgan", "wgangp"])
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--gan_iter", type=int, default=10)
    p.add_argument("--gamma_correct", action="store_true")
    p.add_argument("--reg_patch", action="store_true")
    p.add_argument("--reg_patch_len", type=int, default=1)
    p.add_argument("--reg_patch_freq", type=int, default=5)
    p.add_argument("--reg_lambda_tv", type=float, default=1.0)

    # ---- llff / llff_downX dataset options ----
    p.add_argument("--spheric_poses", action="store_true")
    p.add_argument("--val_num", type=int, default=1)
    p.add_argument("--include_var", action="store_true")
    p.add_argument("--ref_freq", type=int, default=1)
    p.add_argument("--unified_dir", action="store_true")
    p.add_argument("--all_ref", action="store_true")
    p.add_argument("--use_subset", action="store_true")
    p.add_argument("--subset_num", type=int, default=20)

    # ---- blender_downX dataset options ----
    p.add_argument("--rand_dir", action="store_true")
    p.add_argument("--train_crop", action="store_true")

    # ---- refine model options (models/refine_model.py:26-44) ----
    p.add_argument("--refine_network", type=str, default="unetgenerator")
    p.add_argument("--refine_with_mse", action="store_true")
    p.add_argument("--refine_with_l1", action="store_true")
    p.add_argument("--refine_with_vgg", action="store_true")
    p.add_argument("--refine_with_grad", action="store_true")
    p.add_argument("--lambda_refine_vgg", type=float, default=1.0)
    p.add_argument("--lambda_refine_l1", type=float, default=1.0)
    p.add_argument("--lambda_refine_mse", type=float, default=10.0)
    p.add_argument("--lambda_refine_grad", type=float, default=1.0)
    p.add_argument("--refine_as_gan", action="store_true")
    p.add_argument("--vgg_weights", type=str, default=None,
                   help="npz from tools/convert_vgg.py (TPU-side VGG19)")

    # ---- llff_refine dataset options (data/llff_refine_dataset.py:22-33)
    p.add_argument("--syn_dataroot", type=str, default=None)
    p.add_argument("--ref_idx", type=int, default=0)
    p.add_argument("--aug_num", type=int, default=200)
    p.add_argument("--distort_scale", type=float, default=0.3)
    p.add_argument("--num_ref_patches", type=int, default=8)
    p.add_argument("--with_gt_patch", action="store_true")
    p.add_argument("--ref_offset", type=int, default=64)
    p.add_argument("--data_num", type=int, default=500000)
    p.add_argument("--test_img_split", type=int, default=4)

    # ---- network options (models/networks.py) ----
    p.add_argument("--learn_residual", action="store_true")
    p.add_argument("--input_nc", type=int, default=27,
                   help="UNet input channels; must equal "
                        "3*(1+num_ref_patches) (validated at setup; flax "
                        "convs infer channels from data)")
    p.add_argument("--output_nc", type=int, default=3)
    p.add_argument("--norm", type=str, default="batch")
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--num_downs", type=int, default=6,
                   help="U-Net depth (reference hardcodes 6, "
                        "models/networks.py:346; exposed so tiny "
                        "patches/tests can shrink the net)")
    p.add_argument("--ndf_dis", type=int, default=64)
    p.add_argument("--n_layers_D", type=int, default=3,
                   help="compat no-op: dead flag in the reference too "
                        "(NLayerDiscriminator depth follows --patch_len)")
    p.add_argument("--not_use_ref", action="store_true")

    # ---- TPU-native additions ----
    p.add_argument("--fast_preset", type=str, default=None,
                   choices=sorted(FAST_PRESETS),
                   help="expand to a VALIDATED fast-sampling config "
                        "(the quality ladder in STATUS.md/README; the "
                        "reference's per-family scripts/*.sh are its "
                        "equivalent config surface). 'llff': the NI=16 "
                        "slim+anneal primary, FORWARD-FACING scenes "
                        "only (~17x parity speed, at-or-above parity "
                        "PSNR on all four LLFF scene families); "
                        "'quality': NI=24 slim (~12x, beats parity "
                        "everywhere on LLFF); 'blender'/'universal': "
                        "NI=48 two-round (~4-5x, within 0.4 dB of "
                        "parity on 360-degree scenes AND at-or-above "
                        "on LLFF); 'parity': the reference's exact "
                        "coarse+fine path. Explicit flags override "
                        "individual preset values")
    p.add_argument("--force_config", action="store_true",
                   help="override the footgun guard that refuses "
                        "configurations measured to lose >3 dB "
                        "(e.g. pad-anneal-to-zero on white-bkgd/"
                        "360-degree scenes)")
    p.add_argument("--compilation_cache_dir", type=str,
                   default=os.path.expanduser("~/.cache/nerfsr_tpu/xla"),
                   help="persistent XLA compilation cache: the full "
                        "train-step compile (minutes on small hosts) is "
                        "paid once per (program, config), not once per "
                        "process. '' disables.")
    p.add_argument("--precision", type=str, default="mixed",
                   choices=["f32", "bf16", "mixed"],
                   help="mixed: bf16 MLP trunk, f32 heads/composite")
    p.add_argument("--mesh_devices", type=int, default=0,
                   help="devices in the data mesh (0 = all local devices)")
    p.add_argument("--steps_per_epoch", type=int, default=0,
                   help="override epoch length (0 = dataset_size/batch)")
    p.add_argument("--log_every", type=int, default=0,
                   help="train-loss console/TB cadence override "
                        "(0 = use --print_freq)")
    p.add_argument("--use_pallas", action="store_true",
                   help="EXPERIMENTAL fused Pallas compositing kernel "
                        "(TPU; loss-identical, no measured speedup — "
                        "XLA's fusion already covers it)")
    p.add_argument("--use_pallas_mlp", action="store_true",
                   help="EXPERIMENTAL fully-fused Pallas MLP megakernel "
                        "(TPU; default architecture only; fwd ~= XLA, "
                        "no measured speedup)")
    p.add_argument("--pallas_mlp_bwd", type=str, default="xla",
                   choices=["xla", "pallas"],
                   help="megakernel backward: 'xla' recompute fallback "
                        "(always compiles) or the fused Pallas kernel")
    p.add_argument("--pallas_interpret", action="store_true",
                   help="run Pallas kernels in interpreter mode (CPU)")
    p.add_argument("--fast_sampling", action="store_true",
                   help="proposal-MLP importance sampling: a tiny "
                        "sigma-only net shapes the CDF; the big MLP runs "
                        "once on N_importance samples (3x fewer big-MLP "
                        "points at flagship shapes). Opt-in; the parity "
                        "coarse+fine path is untouched when off")
    p.add_argument("--n_prop", type=int, default=64,
                   help="proposal samples per ray (--fast_sampling)")
    p.add_argument("--n_prop_levels", type=int, default=1,
                   help="proposal rounds (--fast_sampling): 2 = "
                        "mip-NeRF-360-style second resampled round "
                        "(better thin-structure placement at the same "
                        "prop cost when n_prop + n_prop2 matches the "
                        "single-round budget)")
    p.add_argument("--n_prop2", type=int, default=32,
                   help="second-round proposal samples per ray "
                        "(--n_prop_levels 2)")
    p.add_argument("--prop_pad", type=float, default=0.01,
                   help="uniform histogram floor added before each "
                        "multi-round CDF resample (--n_prop_levels 2): "
                        "keeps exploration mass everywhere so a round-1 "
                        "false negative can still be corrected")
    p.add_argument("--use_pallas_sampling", action="store_true",
                   help="EXPERIMENTAL fused inverse-CDF resample Pallas "
                        "kernel for the --fast_sampling resamples "
                        "(f32-rounding equivalent to the XLA path, not "
                        "bitwise). Measured A/B SLOWER than the "
                        "gather-free XLA path (2.64->3.29 ms/step at "
                        "the NI=24 primary) — kept as a kernel baseline")
    p.add_argument("--prop_pad_anneal_frac", type=float, default=0.0,
                   help="schedule-relative --prop_pad_anneal: decay the "
                        "resample pad over this fraction of the full "
                        "training schedule (n_epochs x steps/epoch, "
                        "resolved once the dataset size is known). The "
                        "bench-primary config uses 0.5. Ignored when "
                        "--prop_pad_anneal is set explicitly")
    p.add_argument("--prop_pad_anneal", type=int, default=0,
                   help="decay the resample padding linearly from "
                        "--prop_pad to --prop_pad_final over this many "
                        "train steps (0 = constant pad). Early "
                        "exploration floor, late concentration; eval "
                        "uses the fully annealed value")
    p.add_argument("--prop_pad_final", type=float, default=0.0,
                   help="resample padding after --prop_pad_anneal steps")
    p.add_argument("--prop_D", type=int, default=4,
                   help="proposal MLP depth (--fast_sampling)")
    p.add_argument("--prop_W", type=int, default=64,
                   help="proposal MLP width (--fast_sampling)")
    p.add_argument("--deg_prop", type=int, default=6,
                   help="proposal posenc degree (--fast_sampling)")
    p.add_argument("--lambda_interlevel", type=float, default=1.0,
                   help="proposal-histogram bound loss weight "
                        "(--fast_sampling)")
    p.add_argument("--fast_uniform_frac", type=float, default=0.0,
                   help="fraction of N_importance drawn uniformly "
                        "instead of from the proposal CDF (defensive "
                        "coverage option; 0 = pure proposal sampling, "
                        "the configuration validated at parity quality "
                        "on LLFF)")
    p.add_argument("--scan_steps", type=int, default=20,
                   help="fold N optimization steps into one compiled "
                        "lax.scan program (amortizes per-dispatch host "
                        "overhead — the production default; 0 = one "
                        "dispatch per step). Epochs shorter than N fall "
                        "back to single steps automatically.")
    p.add_argument("--profile_port", type=int, default=0,
                   help="start a jax.profiler server on this port")
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host: jax.distributed coordinator "
                        "address host:port (process 0's)")
    p.add_argument("--num_processes", type=int, default=0,
                   help="multi-host: total process count (0 = single "
                        "process / auto-detected TPU env)")
    p.add_argument("--process_id", type=int, default=-1,
                   help="multi-host: this process's id (-1 = auto)")

    return p


# dataset-mode -> default overrides (applied when the user did not pass the
# flag explicitly). Parity with the modify_commandline_options set_defaults
# calls cited in the module docstring.
_DATASET_DEFAULTS = {
    "blender": dict(white_bkgd=True, noise_std=0.0),
    "blender_downX": dict(white_bkgd=True, noise_std=0.0),
    "llff": dict(white_bkgd=False, noise_std=1.0),
    "llff_downX": dict(white_bkgd=False, noise_std=1.0),
    # llff_refine declares its own patch_len default of 64
    # (data/llff_refine_dataset.py:22) vs the downX default of 32.
    "llff_refine": dict(white_bkgd=False, noise_std=1.0, patch_len=64),
    "template": dict(),
}


def apply_fast_preset(opt, explicit=()):
    """Expand ``--fast_preset`` into its flag set, skipping any flag the
    user passed explicitly (same semantics as the dataset-default
    overrides). No-op when no preset was requested."""
    preset = getattr(opt, "fast_preset", None)
    if not preset:
        return opt
    for key, val in FAST_PRESETS[preset].items():
        if key not in explicit:
            setattr(opt, key, val)
    return opt


def check_config_guard(opt):
    """Refuse flag combinations MEASURED to destroy quality, unless
    ``--force_config``.

    The one known footgun (STATUS.md round-4 blender-x4 bracket, paired
    full-schedule runs): annealing the resample pad to ~zero on
    360-degree / white-background scenes. Empty and silhouette rays
    need the uniform CDF floor permanently — anneal-to-zero alone
    costs 3 dB there, and the full LLFF NI=16 primary loses 7.2 dB vs
    parity. The same anneal is REQUIRED for peak speed on
    forward-facing LLFF scenes, hence a guard instead of a default.
    """
    anneal_on = (getattr(opt, "prop_pad_anneal", 0) > 0
                 or getattr(opt, "prop_pad_anneal_frac", 0.0) > 0)
    anneals_away = anneal_on and getattr(opt, "prop_pad_final",
                                         0.0) < 0.005
    is_360 = (bool(getattr(opt, "white_bkgd", False))
              or str(getattr(opt, "dataset_mode",
                             "")).startswith("blender"))
    if (getattr(opt, "fast_sampling", False) and anneals_away and is_360
            and not getattr(opt, "force_config", False)):
        raise SystemExit(
            "[config] REFUSING: --prop_pad_anneal*/--prop_pad_final~0 "
            "with a white-background/360-degree (blender) dataset was "
            "measured at -3 to -7.2 dB vs parity (STATUS.md blender-x4 "
            "bracket) — silhouette rays need the pad floor "
            "permanently. Use `--fast_preset blender` (NI=48 "
            "two-round, constant pad) for this scene family, or pass "
            "--force_config to run it anyway.")
    if (getattr(opt, "fast_sampling", False) and is_360
            and getattr(opt, "N_importance", 64) < 32):
        print("[config] WARNING: --fast_sampling with N_importance "
              f"{opt.N_importance} on a 360-degree/white-bkgd scene is "
              "sample-starved (measured -2..-4 dB; the blender fast "
              "pick is N_importance 48 — `--fast_preset blender`).")
    return opt


def parse_options(phase: str, argv=None):
    """Parse argv into a flat options namespace (mirrors ``opt``)."""
    parser = build_parser(phase)
    opt = parser.parse_args(argv)

    # dataset-driven default overrides, applied only for flags the user
    # did not pass explicitly (reference set_defaults semantics).
    raw = argv if argv is not None else os.sys.argv[1:]
    explicit = {a.split("=")[0].lstrip("-") for a in raw
                if a.startswith("--")}
    overrides = _DATASET_DEFAULTS.get(opt.dataset_mode, {})
    if opt.white_bkgd is None:
        opt.white_bkgd = overrides.get("white_bkgd", False)
    for key, val in overrides.items():
        if key != "white_bkgd" and key not in explicit:
            setattr(opt, key, val)
    apply_fast_preset(opt, explicit)
    check_config_guard(opt)

    opt.isTrain = phase == "train"
    opt.isTest = phase == "test"
    opt.isInfer = phase == "infer"
    if opt.suffix:
        opt.name = opt.name + "_" + opt.suffix.format(**vars(opt))
    return opt


def save_options(opt, parser=None):
    """Dump options to ``{phase}_opt.txt/.json``
    (parity: ``options/base_options.py:103-129``)."""
    expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
    os.makedirs(expr_dir, exist_ok=True)
    d = {k: v for k, v in sorted(vars(opt).items())}
    lines = ["----------------- Options ---------------"]
    for k, v in d.items():
        lines.append(f"{str(k):>25}: {v}")
    lines.append("----------------- End -------------------")
    msg = "\n".join(lines)
    with open(os.path.join(expr_dir, f"{opt.phase}_opt.txt"), "w") as f:
        f.write(msg + "\n")
    with open(os.path.join(expr_dir, f"{opt.phase}_opt.json"), "w") as f:
        json.dump({k: (v if _jsonable(v) else str(v)) for k, v in d.items()},
                  f)
    return msg


def _jsonable(v):
    try:
        json.dumps(v)
        return True
    except (TypeError, ValueError):
        return False


def default_options(phase: str = "train", **overrides):
    """Build an options namespace programmatically (tests, bench, API use).

    Equivalent to parsing an empty command line with required flags filled,
    then applying ``overrides``.
    """
    argv = ["--name", overrides.pop("name", "exp"),
            "--dataset_root", overrides.pop("dataset_root", "/tmp"),
            "--img_wh",
            *[str(x) for x in overrides.pop("img_wh", (64, 64))]]
    if "dataset_mode" in overrides:
        # route through argv so the two-phase dataset-default overrides
        # fire exactly as on the CLI (e.g. llff_refine -> patch_len 64,
        # blender -> white_bkgd True); later explicit overrides still
        # win because they are applied after the parse.
        argv += ["--dataset_mode", overrides.pop("dataset_mode")]
    opt = parse_options(phase, argv)
    for k, v in overrides.items():
        if not hasattr(opt, k):
            raise KeyError(f"unknown option: {k}")
        setattr(opt, k, v)
    # a programmatic fast_preset expands like the CLI one: explicit
    # overrides win over preset values, preset values over defaults
    if overrides.get("fast_preset"):
        apply_fast_preset(opt, explicit=set(overrides) - {"fast_preset"})
    check_config_guard(opt)
    return opt
