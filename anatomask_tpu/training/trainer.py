"""Supervised trainer: mesh data parallelism, jit-fused augment+train step.

Capability parity: /root/reference/nnunetv2/training/nnUNetTrainer/nnUNetTrainer.py
(the god-object trainer, 1263 LoC) and the STUNetTrainer family (:15-354):
- lifecycle initialize -> run_training (epoch loop: 250 train / 50 val iters)
  -> on_train_end; checkpoint latest/best/final (:1041-1108); --c resume
- 5-fold split with seed 12345 auto-created as splits_final.json (:505)
- deep supervision loss with 1/2^i weights (:356-362); DC+CE with config
  batch_dice; grad-clip 12; SGD-nesterov-0.99 + PolyLR (:461-465) or the
  STUNet recipe AdamW(1e-4, wd 1e-5, eps 1e-4) + cosine (:70-77)
- per-rank batch/oversample partitioning (:295-340) -> here the HOST builds the
  global batch and shards it over the 'data' mesh axis; forced-foreground
  samples are the global batch's tail exactly as in the reference
- validation_step hard Dice from the highest-res head (:914-975); EMA(0.9)
  pseudo-Dice best-checkpoint tracking; benchmark mode (variants/benchmarking)
- perform_actual_validation via the Predictor + metrics summary (:1113-1240)

TPU redesign: DDP/NCCL -> one jitted SPMD step over a Mesh(('data',)) with
NamedSharding; gradient all-reduce and global batch-dice emerge from GSPMD
partitioning of the global-batch computation (no explicit collectives); AMP ->
bf16 compute dtype; augmentation runs inside the same jit as fwd/bwd.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field, replace
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anatomask_tpu.configuration import get_allowed_n_proc_DA
from anatomask_tpu.data.augment import (
    AugmentConfig,
    IntensityAugmentConfig,
    SpatialAugmentConfig,
    make_train_augment_fn,
    make_val_transform_fn,
    rotation_ranges_and_initial_patch_size,
)
from anatomask_tpu.data.dataset import CaseDataset, unpack_dataset
from anatomask_tpu.data.pipeline import PrefetchPipeline
from anatomask_tpu.data.sampler import PatchSampler
from anatomask_tpu.models.build import build_network_from_plans
from anatomask_tpu.paths import require
from anatomask_tpu.plans.label_handling import determine_num_input_channels
from anatomask_tpu.plans.plans_handler import ConfigurationManager, PlansManager, load_json, save_json
from anatomask_tpu.training import checkpoint as ckpt_lib
from anatomask_tpu.training.logger import TrainingLogger
from anatomask_tpu.training.losses import (
    dc_and_bce_loss,
    dc_and_ce_loss,
    dc_and_topk_loss,
    cross_entropy_loss,
    deep_supervision_loss,
    deep_supervision_weights,
    hard_dice_parts,
    memory_efficient_soft_dice_loss,
)
from anatomask_tpu.training.schedules import (
    cosine_annealing_schedule,
    poly_lr_schedule,
)


@dataclass(frozen=True)
class TrainerConfig:
    """Declarative trainer configuration. The reference's trainer-variant
    subclass zoo (variants/: Xepochs, CosAnneal, Adam, NoMirroring, NoDA,
    DiceLoss/CELoss/TopkLoss, probabilisticOversampling, benchmark, ...) maps to
    preset instances of this dataclass (see TRAINER_PRESETS)."""
    name: str = "ATKTrainer"
    num_epochs: int = 1000
    num_iterations_per_epoch: int = 250
    num_val_iterations_per_epoch: int = 50
    optimizer: str = "sgd"                 # sgd | adamw | adam
    initial_lr: float = 1e-2
    weight_decay: float = 3e-5
    adam_eps: float = 1e-8
    lr_scheduler: str = "poly"             # poly | cosine
    grad_clip: float = 12.0
    oversample_foreground_percent: float = 0.33
    probabilistic_oversampling: bool = False
    enable_deep_supervision: bool = True
    loss: str = "dc_ce"                    # dc_ce | dice | ce | dc_topk
    do_mirroring_aug: bool = True
    do_data_augmentation: bool = True
    save_every: int = 50
    arch_name: Optional[str] = None        # e.g. "STUNet-B"
    compute_dtype: str = "bfloat16"
    benchmark: bool = False                # 5-epoch speed benchmark semantics
    benchmark_no_dataloading: bool = False # GPU/TPU-only throughput (dummy batch)
    num_workers: Optional[int] = None
    seed: int = 12345
    # explicit variant switches (reference subclasses nnUNetTrainerDA5 /
    # nnUNetTrainerDAOrd0 / nnUNetTrainerBN); fields, not name-string dispatch,
    # so renamed or user-defined configs keep the behavior
    aggressive_da: bool = False            # DA5-style augmentation stack
    order0_data_interp: bool = False       # nearest-neighbor data resampling in DA
    # reference SpatialTransform order_data=3 (nnUNetTrainer.py:661); TPU
    # default is 1 (trilinear) — the exact cubic path is gather-bound on TPU
    # (PLAN.md); set 3 for reference-default fidelity
    data_interpolation_order: int = 1
    network_norm: str = "instance"         # instance | batch
    # device-mesh policy: when the plans batch size doesn't divide the device
    # count, scale the GLOBAL batch up to the next multiple so every device is
    # used (logged loudly). False = reference-faithful batch at the cost of
    # idle devices.
    scale_batch_to_devices: bool = True
    # gradient checkpointing for the supervised network (reference GC.py
    # analog; plans memory targets assume torch's allocator, so large-patch
    # configs can need this on 16G HBM)
    remat: bool = False
    # HBM-resident case cache for supervised training (data/device_cache.py,
    # same design the SSL pretrainer defaults to): host sends only
    # (slot, origin) pairs, patches + seg are sliced on device. None = env
    # ATK_SUP_DEVICE_CACHE (default off: the host pipeline stays the
    # reference-faithful default for supervised — the cache samples oversized
    # cases through a rotating window). Auto-falls back to the host pipeline
    # for multi-process runs, cascade stages, benchmark dummies, and label
    # sets whose values exceed the cache dtype's exact-integer range.
    device_cache: Optional[bool] = None
    device_cache_mb: int = 1024


def stunet_trainer_config(size: str = "B", **overrides) -> TrainerConfig:
    """Reference STUNetTrainer recipe (STUNetTrainer.py:70-77): AdamW 1e-4,
    wd 1e-5, eps 1e-4, cosine, 1000 epochs."""
    base = TrainerConfig(
        name=f"STUNetTrainer_{size}",
        optimizer="adamw", initial_lr=1e-4, weight_decay=1e-5, adam_eps=1e-4,
        lr_scheduler="cosine", arch_name=f"STUNet-{size}",
    )
    return replace(base, **overrides)


TRAINER_PRESETS: Dict[str, TrainerConfig] = {
    "ATKTrainer": TrainerConfig(),
    "ATKTrainer_1epoch": TrainerConfig(name="ATKTrainer_1epoch", num_epochs=1),
    "ATKTrainer_5epochs": TrainerConfig(name="ATKTrainer_5epochs", num_epochs=5),
    "ATKTrainer_10epochs": TrainerConfig(name="ATKTrainer_10epochs", num_epochs=10),
    "ATKTrainer_20epochs": TrainerConfig(name="ATKTrainer_20epochs", num_epochs=20),
    "ATKTrainer_50epochs": TrainerConfig(name="ATKTrainer_50epochs", num_epochs=50),
    "ATKTrainer_100epochs": TrainerConfig(name="ATKTrainer_100epochs", num_epochs=100),
    "ATKTrainer_250epochs": TrainerConfig(name="ATKTrainer_250epochs", num_epochs=250),
    "ATKTrainer_2000epochs": TrainerConfig(name="ATKTrainer_2000epochs", num_epochs=2000),
    "ATKTrainer_4000epochs": TrainerConfig(name="ATKTrainer_4000epochs", num_epochs=4000),
    "ATKTrainer_8000epochs": TrainerConfig(name="ATKTrainer_8000epochs", num_epochs=8000),
    "ATKTrainerCosAnneal": TrainerConfig(name="ATKTrainerCosAnneal", lr_scheduler="cosine"),
    "ATKTrainerAdam": TrainerConfig(name="ATKTrainerAdam", optimizer="adam", initial_lr=3e-4),
    "ATKTrainerAdamW": TrainerConfig(name="ATKTrainerAdamW", optimizer="adamw", initial_lr=3e-4),
    # reference variants/optimizer/nnUNetTrainerAdan.py (adan defaults + poly,
    # lr sweep subclasses, CosAnneal variant)
    "ATKTrainerAdan": TrainerConfig(name="ATKTrainerAdan", optimizer="adan"),
    "ATKTrainerAdan1en3": TrainerConfig(name="ATKTrainerAdan1en3", optimizer="adan",
                                        initial_lr=1e-3),
    "ATKTrainerAdan3en4": TrainerConfig(name="ATKTrainerAdan3en4", optimizer="adan",
                                        initial_lr=3e-4),
    "ATKTrainerAdan1en1": TrainerConfig(name="ATKTrainerAdan1en1", optimizer="adan",
                                        initial_lr=1e-1),
    "ATKTrainerAdanCosAnneal": TrainerConfig(name="ATKTrainerAdanCosAnneal",
                                             optimizer="adan", lr_scheduler="cosine"),
    "ATKTrainerNoMirroring": TrainerConfig(name="ATKTrainerNoMirroring", do_mirroring_aug=False),
    # reference variants/training_length/nnUNetTrainer_Xepochs_NoMirroring.py:
    # named epoch-count x no-mirroring combos (also disable test-time mirroring
    # downstream: do_mirroring_aug=False is read by the validation exporter)
    "ATKTrainer_250epochs_NoMirroring": TrainerConfig(
        name="ATKTrainer_250epochs_NoMirroring", num_epochs=250, do_mirroring_aug=False),
    "ATKTrainer_2000epochs_NoMirroring": TrainerConfig(
        name="ATKTrainer_2000epochs_NoMirroring", num_epochs=2000, do_mirroring_aug=False),
    "ATKTrainer_4000epochs_NoMirroring": TrainerConfig(
        name="ATKTrainer_4000epochs_NoMirroring", num_epochs=4000, do_mirroring_aug=False),
    "ATKTrainer_8000epochs_NoMirroring": TrainerConfig(
        name="ATKTrainer_8000epochs_NoMirroring", num_epochs=8000, do_mirroring_aug=False),
    "ATKTrainerNoDA": TrainerConfig(name="ATKTrainerNoDA", do_data_augmentation=False),
    "ATKTrainerNoDeepSupervision": TrainerConfig(name="ATKTrainerNoDeepSupervision", enable_deep_supervision=False),
    "ATKTrainerDiceLoss": TrainerConfig(name="ATKTrainerDiceLoss", loss="dice"),
    "ATKTrainerCELoss": TrainerConfig(name="ATKTrainerCELoss", loss="ce"),
    "ATKTrainerTopkLoss": TrainerConfig(name="ATKTrainerTopkLoss", loss="dc_topk"),
    "ATKTrainer_probabilisticOversampling": TrainerConfig(
        name="ATKTrainer_probabilisticOversampling", probabilistic_oversampling=True),
    "ATKTrainer_probabilisticOversampling_033": TrainerConfig(
        name="ATKTrainer_probabilisticOversampling_033", probabilistic_oversampling=True,
        oversample_foreground_percent=0.33),
    "ATKTrainer_probabilisticOversampling_010": TrainerConfig(
        name="ATKTrainer_probabilisticOversampling_010", probabilistic_oversampling=True,
        oversample_foreground_percent=0.10),
    "ATKTrainerBenchmark_5epochs": TrainerConfig(
        name="ATKTrainerBenchmark_5epochs", num_epochs=5, benchmark=True),
    "ATKTrainerBenchmark_5epochs_noDataLoading": TrainerConfig(
        name="ATKTrainerBenchmark_5epochs_noDataLoading", num_epochs=5, benchmark=True,
        benchmark_no_dataloading=True),
    "ATKTrainerDA5": TrainerConfig(name="ATKTrainerDA5", aggressive_da=True),
    "ATKTrainerDAOrd0": TrainerConfig(name="ATKTrainerDAOrd0", order0_data_interp=True),
    # reference-default order_data=3 cubic warp (costlier on TPU, PLAN.md)
    "ATKTrainerDataOrder3": TrainerConfig(name="ATKTrainerDataOrder3",
                                          data_interpolation_order=3),
    "ATKTrainerBN": TrainerConfig(name="ATKTrainerBN", network_norm="batch"),
    "STUNetTrainer_small": stunet_trainer_config("S"),
    "STUNetTrainer_base": stunet_trainer_config("B"),
    "STUNetTrainer_large": stunet_trainer_config("L"),
    "STUNetTrainer_huge": stunet_trainer_config("H"),
    "STUNetTrainer_base_ft": stunet_trainer_config("B"),
}


def get_trainer_config(name: str) -> TrainerConfig:
    if name not in TRAINER_PRESETS:
        raise RuntimeError(f"Unknown trainer {name!r}. Known: {sorted(TRAINER_PRESETS)}")
    return TRAINER_PRESETS[name]


def generate_crossval_split(keys: List[str], n_splits: int = 5, seed: int = 12345) -> List[dict]:
    """KFold(5, shuffle, seed 12345) as in the reference do_split (:505)."""
    keys = sorted(keys)
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(keys))
    folds = np.array_split(idx, n_splits)
    splits = []
    for f in range(n_splits):
        val_idx = set(folds[f].tolist())
        splits.append({
            "train": [keys[i] for i in range(len(keys)) if i not in val_idx],
            "val": [keys[i] for i in sorted(val_idx)],
        })
    return splits


def promote_2d_configuration(cfg: dict) -> dict:
    """Rewrite a 2D configuration dict as singleton-3D: patch (1, y, x),
    per-stage pool/kernel sizes get a leading 1."""
    out = dict(cfg)
    out["patch_size"] = [1, *cfg["patch_size"]]
    if "pool_op_kernel_sizes" in cfg:
        out["pool_op_kernel_sizes"] = [[1, *p] for p in cfg["pool_op_kernel_sizes"]]
    if "conv_kernel_sizes" in cfg:
        out["conv_kernel_sizes"] = [[1, *k] for k in cfg["conv_kernel_sizes"]]
    if "num_pool_per_axis" in cfg:
        out["num_pool_per_axis"] = [0, *cfg["num_pool_per_axis"]]
    if "median_image_size_in_voxels" in cfg and len(cfg["median_image_size_in_voxels"]) == 2:
        out["median_image_size_in_voxels"] = [1, *cfg["median_image_size_in_voxels"]]
    return out


def pick_mesh_for_batch(batch_size: int, scale_batch_to_devices: bool = False,
                        log=print, max_devices: Optional[int] = None) -> Tuple[Mesh, int, int]:
    """Data-parallel Mesh(('data',)) over ALL global devices when possible.

    Returns (mesh, n_shards, global_batch_size). If batch_size doesn't divide
    the device count: with scale_batch_to_devices the GLOBAL batch is scaled up
    to the next multiple of the device count (every device used; logged), else
    the mesh shrinks to the largest divisor (devices idle; warned loudly).
    Replaces the reference's per-rank batch partition
    (nnUNetTrainer._set_batch_size_and_oversample, :295-340).

    max_devices (or env ATK_NUM_DEVICES; CLI -num_gpus) caps the mesh to the
    first N devices — the analog of the reference's -num_gpus
    (run_training.py:108-142)."""
    devices = jax.devices()
    if max_devices is None:
        env_cap = int(os.environ.get("ATK_NUM_DEVICES", "0"))
        max_devices = env_cap if env_cap > 0 else None
    if max_devices is not None and max_devices < len(devices):
        log(f"[mesh] device cap: using {max_devices}/{len(devices)} devices")
        devices = devices[:max_devices]
    n = len(devices)
    global_batch = batch_size
    if batch_size % n != 0:
        if scale_batch_to_devices:
            global_batch = ((batch_size + n - 1) // n) * n
            log(f"[mesh] global batch scaled {batch_size} -> {global_batch} to use "
                f"all {n} devices (plans batch does not divide the device count)")
        else:
            while batch_size % n != 0:
                n -= 1
            log(f"[mesh] WARNING: batch {batch_size} uses only {n}/{len(devices)} "
                f"devices; set scale_batch_to_devices=True to scale the global batch")
    return Mesh(np.array(devices[:n]) if n < len(devices) else np.array(devices),
                ("data",)), n, global_batch


class Trainer:
    def __init__(
        self,
        plans: dict | str,
        configuration: str,
        fold: int | str,
        dataset_json: dict,
        config: TrainerConfig = TrainerConfig(),
        output_folder: Optional[str] = None,
        preprocessed_dataset_folder_base: Optional[str] = None,
    ):
        self.plans_manager = PlansManager(plans)
        self.configuration_manager = self.plans_manager.get_configuration(configuration)
        self.configuration_name = configuration
        # 2D configurations are promoted to singleton-3D (patch (1, y, z),
        # kernels (1, k, k)): mathematically identical to 2D convs/norms, and
        # every 3D code path (sampler, on-device augmentation, sliding window)
        # is reused unchanged. Reference analog: data_loader_2d + 2D network.
        if len(self.configuration_manager.patch_size) == 2:
            self.configuration_manager = ConfigurationManager(
                promote_2d_configuration(self.configuration_manager.configuration))
        self.fold = fold
        self.dataset_json = dataset_json
        # smoke-test overrides: shrink epochs without a dedicated preset
        # (reference analog: nnUNetTrainer subclasses overriding
        # num_iterations_per_epoch for debugging)
        if os.environ.get("ATK_ITERS_PER_EPOCH"):
            config = replace(
                config, num_iterations_per_epoch=int(os.environ["ATK_ITERS_PER_EPOCH"]))
        if os.environ.get("ATK_VAL_ITERS"):
            config = replace(
                config, num_val_iterations_per_epoch=int(os.environ["ATK_VAL_ITERS"]))
        self.cfg = config
        self.label_manager = self.plans_manager.get_label_manager(dataset_json)

        self.preprocessed_dataset_folder_base = preprocessed_dataset_folder_base or os.path.join(
            require("preprocessed"), self.plans_manager.dataset_name
        )
        self.preprocessed_dataset_folder = os.path.join(
            self.preprocessed_dataset_folder_base, self.configuration_manager.data_identifier
        )
        if output_folder is not None:
            self.output_folder_base = output_folder
        else:
            self.output_folder_base = os.path.join(
                require("results"), self.plans_manager.dataset_name,
                f"{config.name}__{self.plans_manager.plans_name}__{configuration}",
            )
        self.output_folder = os.path.join(self.output_folder_base, f"fold_{fold}")
        os.makedirs(self.output_folder, exist_ok=True)

        self.logger = TrainingLogger()
        self.current_epoch = 0
        self._best_ema: Optional[float] = None
        self.disable_checkpointing = False
        self.network = None
        self.params = None
        self.opt_state = None
        self._train_step = None
        self._val_step = None
        self.inference_allowed_mirroring_axes: Optional[Tuple[int, ...]] = None
        self._epoch_times: List[float] = []
        self._log_lines: List[str] = []

    # --- logging --------------------------------------------------------------
    def print_to_log_file(self, *args, also_print_to_console: bool = True):
        line = " ".join(str(a) for a in args)
        self._log_lines.append(line)
        if also_print_to_console:
            print(line, flush=True)
        try:
            with open(os.path.join(self.output_folder, "training_log.txt"), "a") as f:
                f.write(line + "\n")
        except IOError:
            pass

    def _save_debug_information(self):
        dbg = {
            "jax_version": jax.__version__,
            "backend": jax.default_backend(),
            "devices": [str(d) for d in jax.devices()],
            "trainer_config": {k: str(v) for k, v in self.cfg.__dict__.items()},
            "configuration_name": self.configuration_name,
            "patch_size": self.configuration_manager.patch_size,
            "batch_size": self.configuration_manager.batch_size,
        }
        with open(os.path.join(self.output_folder, "debug.json"), "w") as f:
            json.dump(dbg, f, indent=2)

    # --- splits ---------------------------------------------------------------
    def do_split(self) -> Tuple[List[str], List[str]]:
        all_keys = sorted(CaseDataset(self.preprocessed_dataset_folder).keys())
        if self.fold == "all":
            return all_keys, all_keys
        splits_file = os.path.join(self.preprocessed_dataset_folder_base, "splits_final.json")
        if not os.path.isfile(splits_file):
            splits = generate_crossval_split(all_keys, 5, seed=12345)
            save_json(splits, splits_file)
        else:
            splits = load_json(splits_file)
        fold = int(self.fold)
        if fold < len(splits):
            tr, val = splits[fold]["train"], splits[fold]["val"]
        else:
            # fold beyond splits: random 80:20 (reference behavior)
            rng = np.random.RandomState(12345 + fold)
            idx = rng.permutation(len(all_keys))
            n_val = max(1, len(all_keys) // 5)
            val = [all_keys[i] for i in idx[:n_val]]
            tr = [all_keys[i] for i in idx[n_val:]]
        return tr, val

    # --- deep supervision topology --------------------------------------------
    def _ds_factors(self) -> List[Tuple[int, ...]]:
        pools = [list(p) for p in self.configuration_manager.pool_op_kernel_sizes]
        if pools and all(p == 1 for p in pools[0]):
            pools = pools[1:]
        if self.cfg.arch_name and self.cfg.arch_name.lower().startswith("stunet"):
            while len(pools) < 5:
                pools.append([1] * len(pools[0]))
            pools = pools[:5]
        n_outputs = len(pools)
        factors = [tuple([1] * len(pools[0]))]
        cur = np.ones(len(pools[0]), dtype=int)
        for p in pools[:-1]:
            cur = cur * np.asarray(p)
            factors.append(tuple(int(i) for i in cur))
        return factors[:n_outputs]

    # --- initialization -------------------------------------------------------
    def initialize(self):
        cm = self.configuration_manager
        num_in = determine_num_input_channels(self.plans_manager, cm, self.dataset_json)
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        self.network = build_network_from_plans(
            self.plans_manager, cm, num_in, self.label_manager.num_segmentation_heads,
            arch_name=self.cfg.arch_name,
            deep_supervision=self.cfg.enable_deep_supervision, dtype=dtype,
            norm=self.cfg.network_norm,  # nnUNetTrainerBN analog
            remat=self.cfg.remat,
        )
        patch = tuple(cm.patch_size)
        rng = jax.random.PRNGKey(self.cfg.seed)
        example = jnp.zeros((1, *patch, num_in), dtype)
        self.params = self.network.init(rng, example)["params"]

        steps_per_epoch = self.cfg.num_iterations_per_epoch
        total_steps = self.cfg.num_epochs * steps_per_epoch
        if self.cfg.lr_scheduler == "poly":
            # stepped per-epoch like the reference PolyLRScheduler
            base = poly_lr_schedule(self.cfg.initial_lr, self.cfg.num_epochs)
            self._lr_schedule = lambda step: base(step // steps_per_epoch)
        else:
            base = cosine_annealing_schedule(self.cfg.initial_lr, self.cfg.num_epochs)
            self._lr_schedule = lambda step: base(step // steps_per_epoch)

        chain = [optax.clip_by_global_norm(self.cfg.grad_clip)]
        if self.cfg.optimizer == "sgd":
            chain += [
                optax.add_decayed_weights(self.cfg.weight_decay),
                optax.sgd(self._lr_schedule, momentum=0.99, nesterov=True),
            ]
        elif self.cfg.optimizer == "adamw":
            chain += [optax.adamw(self._lr_schedule, weight_decay=self.cfg.weight_decay,
                                  eps=self.cfg.adam_eps)]
        elif self.cfg.optimizer == "adam":
            chain += [optax.adam(self._lr_schedule, eps=self.cfg.adam_eps)]
        elif self.cfg.optimizer == "adan":
            # reference nnUNetTrainerAdan (adan_pytorch defaults, poly/cos LR)
            chain += [optax.adan(self._lr_schedule, weight_decay=self.cfg.weight_decay)]
        else:
            raise RuntimeError(f"unknown optimizer {self.cfg.optimizer}")
        self.optimizer = optax.chain(*chain)
        self.opt_state = self.optimizer.init(self.params)
        self.step_counter = 0

        # augmentation configs
        rot, dummy_2d, initial_patch, mirror_axes = rotation_ranges_and_initial_patch_size(patch)
        self.inference_allowed_mirroring_axes = mirror_axes if self.cfg.do_mirroring_aug else None
        self.initial_patch_size = tuple(int(i) for i in initial_patch)
        ds_factors = tuple(self._ds_factors()) if self.cfg.enable_deep_supervision else ((1,) * len(patch),)
        mask_channels = tuple(
            i for i, m in enumerate(cm.use_mask_for_norm or []) if m
        )
        # reference order_seg=1: per-label linear indicator warp (the static
        # label set comes from the dataset; -1 is the crop-pad fill value)
        seg_warp_labels = tuple(sorted({-1, *map(int, self.label_manager.all_labels)}
                                       | ({int(self.label_manager.ignore_label)}
                                          if self.label_manager.has_ignore_label else set())))
        da5 = None
        if self.cfg.do_data_augmentation:
            aggressive = self.cfg.aggressive_da  # reference nnUNetTrainerDA5
            spatial = SpatialAugmentConfig(
                patch_size=patch,
                rotation_x=tuple(rot["x"]), rotation_y=tuple(rot["y"]), rotation_z=tuple(rot["z"]),
                dummy_2d=dummy_2d,
                # DA5 SpatialTransform: p_rot .4, p_scale .2, elastic OFF (:141-148)
                p_rotation=0.4 if aggressive else 0.2,
                p_scaling=0.2,
                data_interpolation_order0=self.cfg.order0_data_interp,  # nnUNetTrainerDAOrd0
                data_interpolation_order=self.cfg.data_interpolation_order,
                seg_labels=(None if self.cfg.order0_data_interp else seg_warp_labels),
            )
            intensity = IntensityAugmentConfig(lowres_ignore_axis0=dummy_2d)
            if aggressive:
                from anatomask_tpu.data.augment_da5 import DA5Config
                da5 = DA5Config()
                intensity = IntensityAugmentConfig(
                    lowres_ignore_axis0=dummy_2d,
                    p_noise=0.1, p_lowres=0.15, lowres_zoom=(0.25, 1.0),
                    p_gamma=0.1, p_gamma_invert=0.1)
        else:
            spatial = SpatialAugmentConfig(patch_size=patch, p_rotation=0.0, p_scaling=0.0)
            intensity = IntensityAugmentConfig(
                p_noise=0, p_blur=0, p_brightness=0, p_contrast=0, p_lowres=0,
                p_gamma=0, p_gamma_invert=0)
        cascade_labels = (
            tuple(self.label_manager.foreground_labels)
            if cm.previous_stage_name is not None else ())
        self.aug_config = AugmentConfig(
            spatial=spatial, intensity=intensity, da5=da5,
            mirror_axes=mirror_axes if (self.cfg.do_mirroring_aug and self.cfg.do_data_augmentation) else (),
            mask_channels_for_norm=mask_channels,
            ds_scales=tuple(ds_factors),
            cascade_foreground_labels=cascade_labels,
        )
        self.val_config = AugmentConfig(
            spatial=SpatialAugmentConfig(patch_size=patch, p_rotation=0.0, p_scaling=0.0),
            mirror_axes=(), mask_channels_for_norm=mask_channels, ds_scales=tuple(ds_factors),
            cascade_foreground_labels=cascade_labels,
        )

        self._build_steps()
        self._save_debug_information()
        save_json(self.plans_manager.plans, os.path.join(self.output_folder_base, "plans.json"), sort_keys=False)
        save_json(self.dataset_json, os.path.join(self.output_folder_base, "dataset.json"), sort_keys=False)

    # --- loss -----------------------------------------------------------------
    def _single_scale_loss(self, logits, seg_target):
        """seg_target: (B, *spatial, 1) int. Regions handled by on-device one-hot."""
        lm = self.label_manager
        batch_dice = bool(self.configuration_manager.batch_dice)
        if lm.has_regions:
            regions = lm.foreground_regions
            t = seg_target[..., 0]
            chans = [jnp.isin(t, jnp.asarray(r if isinstance(r, tuple) else (r,))).astype(jnp.float32)
                     for r in regions]
            target = jnp.stack(chans, axis=-1)
            if lm.has_ignore_label:
                target = jnp.concatenate(
                    [target, (t == lm.ignore_label).astype(jnp.float32)[..., None]], -1)
            return dc_and_bce_loss(logits, target, batch_dice=batch_dice,
                                   has_ignore_channel=lm.has_ignore_label)
        t = seg_target[..., 0].astype(jnp.int32)
        ignore = lm.ignore_label
        if self.cfg.loss == "dc_ce":
            return dc_and_ce_loss(logits, t, batch_dice=batch_dice, ignore_label=ignore)
        if self.cfg.loss == "dice":
            mask = None if ignore is None else (t != ignore)[..., None]
            tt = t if ignore is None else jnp.where(t == ignore, 0, t)
            return memory_efficient_soft_dice_loss(logits, tt, batch_dice=batch_dice, loss_mask=mask)
        if self.cfg.loss == "ce":
            mask = None if ignore is None else (t != ignore)[..., None]
            tt = t if ignore is None else jnp.where(t == ignore, 0, t)
            return cross_entropy_loss(logits, tt, mask)
        if self.cfg.loss == "dc_topk":
            return dc_and_topk_loss(logits, t, batch_dice=batch_dice, ignore_label=ignore)
        raise RuntimeError(f"unknown loss {self.cfg.loss}")

    def _full_loss(self, outputs, targets):
        if not isinstance(outputs, (tuple, list)):
            outputs = [outputs]
        n = min(len(outputs), len(targets))
        if n == 1:
            return self._single_scale_loss(outputs[0], targets[0])
        return deep_supervision_loss(
            list(outputs)[:n], list(targets)[:n], self._single_scale_loss,
            deep_supervision_weights(n),
        )

    # --- multi-host helpers -----------------------------------------------------
    def _host_batch_spec(self) -> Tuple[int, float]:
        """(local_batch_size, local_oversample_percent) for this host's sampler."""
        if not hasattr(self, "global_batch_size"):
            self.mesh, self.n_shards, self.global_batch_size = pick_mesh_for_batch(
                self.configuration_manager.batch_size,
                scale_batch_to_devices=self.cfg.scale_batch_to_devices,
                log=self.print_to_log_file)
        nproc = jax.process_count()
        if nproc == 1:
            return self.global_batch_size, self.cfg.oversample_foreground_percent
        from anatomask_tpu.parallel.mesh import compute_shard_batch_and_oversample
        return compute_shard_batch_and_oversample(
            self.global_batch_size, self.cfg.oversample_foreground_percent,
            jax.process_index(), nproc)

    def _to_global(self, arr) -> jax.Array:
        """Host batch -> device array. Single process: plain transfer (GSPMD
        reshards). Multi-host: assemble the global batch from per-process local
        shards. Already-global jax.Arrays (pre-staged dummy benchmark batches)
        pass through untouched."""
        if isinstance(arr, jax.Array):
            return arr
        if jax.process_count() == 1:
            return jnp.asarray(arr)
        return jax.make_array_from_process_local_data(
            self._batch_sharding, np.asarray(arr))

    # --- jitted steps ---------------------------------------------------------
    def _build_steps(self):
        cm = self.configuration_manager
        self.mesh, self.n_shards, self.global_batch_size = pick_mesh_for_batch(
            cm.batch_size, scale_batch_to_devices=self.cfg.scale_batch_to_devices,
            log=self.print_to_log_file)
        if jax.process_count() > 1 and self.global_batch_size % self.n_shards != 0:
            raise RuntimeError(
                f"multi-host training needs global batch ({self.global_batch_size}) "
                f"divisible by the device count ({self.n_shards}); enable "
                f"scale_batch_to_devices")
        repl = NamedSharding(self.mesh, P())
        batch_sharding = NamedSharding(self.mesh, P("data"))
        self._batch_sharding = batch_sharding
        self._replicated = repl

        augment_fn = make_train_augment_fn(self.aug_config)
        val_fn = make_val_transform_fn(self.val_config)
        optimizer = self.optimizer

        def train_step(params, opt_state, rng, data, seg):
            aug_data, targets = augment_fn(rng, data, seg)
            aug_data = aug_data.astype(
                jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32)

            def loss_fn(p):
                outputs = self.network.apply({"params": p}, aug_data)
                return self._full_loss(outputs, targets)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt_state, loss

        def val_step(params, rng, data, seg):
            vdata, targets = val_fn(rng, data, seg)
            vdata = vdata.astype(
                jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32)
            outputs = self.network.apply({"params": params}, vdata)
            loss = self._full_loss(outputs, targets)
            highest = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
            lm = self.label_manager
            if lm.has_regions:
                t = targets[0][..., 0]
                chans = [jnp.isin(t, jnp.asarray(r if isinstance(r, tuple) else (r,))).astype(jnp.float32)
                         for r in lm.foreground_regions]
                tgt = jnp.stack(chans, -1)
                if lm.has_ignore_label:
                    tgt = jnp.concatenate([tgt, (t == lm.ignore_label).astype(jnp.float32)[..., None]], -1)
                tp, fp, fn = hard_dice_parts(highest, tgt, has_regions=True,
                                             ignore_label=lm.ignore_label)
            else:
                tp, fp, fn = hard_dice_parts(highest, targets[0][..., 0],
                                             ignore_label=lm.ignore_label)
            return loss, tp, fp, fn

        self._train_step = jax.jit(
            train_step,
            in_shardings=(repl, repl, repl, batch_sharding, batch_sharding),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )
        self._val_step = jax.jit(
            val_step,
            in_shardings=(repl, repl, batch_sharding, batch_sharding),
            out_shardings=(repl, repl, repl, repl),
        )

    # --- dataloaders ----------------------------------------------------------
    def get_dataloaders(self):
        tr_keys, val_keys = self.do_split()
        cm = self.configuration_manager
        prev_stage_folder = None
        if cm.previous_stage_name is not None:
            # <results>/<dataset>/<trainer>__<plans>__<prev_stage>/predicted_next_stage/<this_config>
            parent, model_dir = os.path.split(self.output_folder_base.rstrip(os.sep))
            prev_model_dir = model_dir.rsplit("__", 1)[0] + f"__{cm.previous_stage_name}"
            prev_stage_folder = os.path.join(
                parent, prev_model_dir, "predicted_next_stage", self.configuration_name)
            if not os.path.isdir(prev_stage_folder):
                raise RuntimeError(
                    f"Cascade stage requires previous-stage predictions at "
                    f"{prev_stage_folder}. Train {cm.previous_stage_name} (incl. final "
                    f"validation) first.")
        ds_tr = CaseDataset(self.preprocessed_dataset_folder, tr_keys,
                            folder_with_segs_from_previous_stage=prev_stage_folder)
        ds_val = CaseDataset(self.preprocessed_dataset_folder, val_keys,
                             folder_with_segs_from_previous_stage=prev_stage_folder)
        annotated_key = tuple(self.label_manager.all_labels)
        patch = tuple(cm.patch_size)
        sample_patch = self.initial_patch_size if self.cfg.do_data_augmentation else patch
        # multi-host: this process samples only ITS contiguous slice of the
        # global batch, with the oversample fraction adjusted so the union over
        # hosts reproduces the global forced-foreground tail exactly
        # (reference _set_batch_size_and_oversample, nnUNetTrainer.py:295-340)
        local_bs, local_os = self._host_batch_spec()
        self.sampler_train = PatchSampler(
            ds_tr, local_bs, sample_patch, final_patch_size=patch,
            oversample_foreground_percent=local_os,
            annotated_classes_key=annotated_key,
            has_ignore=self.label_manager.has_ignore_label,
            probabilistic_oversampling=self.cfg.probabilistic_oversampling,
            seed=self.cfg.seed + 131071 * jax.process_index(),
            cascade_corruption=cm.previous_stage_name is not None,
        )
        self.sampler_val = PatchSampler(
            ds_val, local_bs, patch, final_patch_size=patch,
            oversample_foreground_percent=local_os,
            annotated_classes_key=annotated_key,
            has_ignore=self.label_manager.has_ignore_label,
            seed=self.cfg.seed + 1 + 131071 * jax.process_index(),
        )
        n_workers = self.cfg.num_workers if self.cfg.num_workers is not None else min(
            4, get_allowed_n_proc_DA())
        tdt = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else None
        self.loader_train = PrefetchPipeline(
            self.sampler_train, num_workers=n_workers,
            # multi-host assembles global arrays itself (_to_global)
            device_put=jax.process_count() == 1, transfer_dtype=tdt)
        self.loader_val = PrefetchPipeline(self.sampler_val, num_workers=max(1, n_workers // 2))
        self._val_keys = val_keys
        self._setup_device_cache(ds_tr, ds_val, sample_patch, patch,
                                 local_bs, local_os, annotated_key,
                                 cascade=cm.previous_stage_name is not None)
        return self.loader_train, self.loader_val

    def _setup_device_cache(self, ds_tr, ds_val, sample_patch, patch,
                            local_bs, local_os, annotated_key, cascade):
        """Optional HBM-resident case cache for the supervised loop (device
        patch+seg extraction; host sends only (slot, origin) pairs). Gated to
        configurations where it is exact and applicable; everything else keeps
        the host pipeline."""
        self.device_cache_train = self.device_cache_val = None
        enabled = self.cfg.device_cache
        if enabled is None:
            # round-5 default: AUTO-enable wherever the gate below finds no
            # disqualifier, mirroring pretrain (ssl/pretrain.py device_cache
            # auto). The host pipeline remains the documented fallback
            # (ATK_SUP_DEVICE_CACHE=0 opts out); on the dev tunnel the host
            # path leaks RSS per transfer (CLAUDE.md) and OOM-killed a 40-epoch
            # run in round 4, so the safe path must not require an env var.
            enabled = os.environ.get("ATK_SUP_DEVICE_CACHE", "1") == "1"
        if not enabled or self.cfg.benchmark_no_dataloading:
            return
        labels = [v for v in self.label_manager.all_labels]
        if self.label_manager.has_ignore_label:
            labels.append(self.label_manager.ignore_label)
        reasons = []
        if not hasattr(self, "_replicated"):
            reasons.append("initialize() has not run (no mesh/shardings yet)")
        if jax.process_count() > 1:
            reasons.append("multi-process run")
        if cascade:
            reasons.append("cascade stage (prev-stage seg channels)")
        if self.cfg.compute_dtype == "bfloat16" and max(
                abs(int(v)) for v in labels) > 256:
            reasons.append("labels exceed bf16 exact-integer range")
        if reasons:
            self.print_to_log_file(
                f"[device-cache] falling back to the host pipeline: "
                f"{'; '.join(reasons)}")
            return
        from anatomask_tpu.data.device_cache import (DeviceCaseCache,
                                                      extract_patches_impl)
        cache_dtype = (jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16"
                       else jnp.float32)
        common = dict(
            oversample_foreground_percent=local_os,
            probabilistic_oversampling=self.cfg.probabilistic_oversampling,
            annotated_classes_key=annotated_key,
            has_ignore=self.label_manager.has_ignore_label,
            batch_size=local_bs, dtype=cache_dtype, include_seg=True,
            sharding=self._replicated, whole_dataset_mode=True,
        )
        self.device_cache_train = DeviceCaseCache(
            ds_tr, initial_patch=sample_patch, final_patch=patch,
            capacity_mb=self.cfg.device_cache_mb,
            seed=self.cfg.seed + 555, **common)
        iters_hint = max(1, self.cfg.num_iterations_per_epoch)
        steps_per_slot = int(os.environ.get(
            "ATK_SUP_CACHE_STEPS_PER_SLOT",
            max(1, iters_hint // self.device_cache_train.num_slots)))
        if self.device_cache_train.whole_dataset_resident:
            # every training case is fully resident — refills would only
            # re-stage identical data (and every H2D costs host RAM on the
            # dev tunnel, see device_cache.py docstring)
            self.print_to_log_file(
                "[device-cache] whole training set resident; refills off")
        else:
            self.device_cache_train.start_refill(steps_per_slot=steps_per_slot)
        if self.cfg.num_val_iterations_per_epoch > 0:
            self.device_cache_val = DeviceCaseCache(
                ds_val, initial_patch=patch, final_patch=patch,
                capacity_mb=max(256, self.cfg.device_cache_mb // 4),
                seed=self.cfg.seed + 556, **common)
            if not self.device_cache_val.whole_dataset_resident:
                self.device_cache_val.start_refill(
                    steps_per_slot=max(1, self.cfg.num_val_iterations_per_epoch
                                       // self.device_cache_val.num_slots))
        nC = self.device_cache_train.num_data_channels
        repl, bsh = self._replicated, self._batch_sharding

        def make_extract(patch_shape):
            patch_shape = tuple(int(v) for v in patch_shape)

            def fn(cache, slots, origins):
                pat = extract_patches_impl(cache, slots, origins, patch_shape)
                # bf16 cache holds exact integer labels (gate above); direct
                # cast back to the host pipeline's seg dtype
                return pat[..., :nC], pat[..., nC:].astype(jnp.int16)

            return jax.jit(fn, in_shardings=(repl, repl, repl),
                           out_shardings=(bsh, bsh))

        self._cache_extract_train = make_extract(sample_patch)
        self._cache_extract_val = make_extract(patch)
        self.print_to_log_file(
            f"[device-cache] supervised: {self.device_cache_train.num_slots} "
            f"train + {getattr(self.device_cache_val, 'num_slots', 0)} val "
            f"slots of {self.device_cache_train.slot_shape} in HBM "
            f"(~{self.cfg.device_cache_mb} MB budget), refill every "
            f"{steps_per_slot} steps; host sends only (slot, origin) pairs")

    def _cache_batch(self, cache, extract_fn):
        slots, origins = cache.sample_batch()
        data, seg = extract_fn(cache.cache, jnp.asarray(slots),
                               jnp.asarray(origins))
        return {"data": data, "seg": seg}

    # --- checkpointing --------------------------------------------------------
    def _checkpoint_meta(self) -> dict:
        return {
            "trainer_name": self.cfg.name,
            "configuration_name": self.configuration_name,
            "current_epoch": self.current_epoch + 1,
            "_best_ema": self._best_ema,
            "logging": self.logger.get_checkpoint(),
            "inference_allowed_mirroring_axes": (
                list(self.inference_allowed_mirroring_axes)
                if self.inference_allowed_mirroring_axes is not None else None),
            "network_arch_name": self.cfg.arch_name,
            "step_counter": self.step_counter,
        }

    def _snapshot_state(self) -> dict:
        """ONE host readback of params + optimizer state; epoch-end saves write
        latest/best from the same snapshot (the readback dominates save cost)."""
        return jax.device_get({
            "network_weights": self.params,
            "optimizer_state": optax_state_to_pytree(self.opt_state),
        })

    def _join_ckpt_writer(self):
        t = getattr(self, "_ckpt_thread", None)
        if t is not None:
            t.join()
            self._ckpt_thread = None
            err = getattr(self, "_ckpt_error", None)
            if err is not None:
                self._ckpt_error = None
                raise RuntimeError("background checkpoint write failed") from err

    def _write_checkpoints_async(self, jobs):
        """jobs: [(filename, host_arrays, meta)] written on a background thread
        so npz serialization overlaps the next epoch's device steps. At most
        one writer outstanding. Write failures are captured and re-raised at
        the next join so a failed save cannot pass silently."""
        import threading

        self._join_ckpt_writer()

        def write():
            try:
                for filename, arrays, meta in jobs:
                    ckpt_lib.save_checkpoint(
                        os.path.join(self.output_folder, filename), arrays, meta)
            except BaseException as e:  # surfaced in _join_ckpt_writer
                self._ckpt_error = e
                self.print_to_log_file(f"CHECKPOINT WRITE FAILED: {e!r}")

        t = threading.Thread(target=write, daemon=True)
        t.start()
        self._ckpt_thread = t

    def save_checkpoint(self, filename: str):
        if self.disable_checkpointing:
            return
        if jax.process_index() != 0:
            return  # replicated params: host 0 writes for everyone
        self._join_ckpt_writer()
        ckpt_lib.save_checkpoint(os.path.join(self.output_folder, filename),
                                 self._snapshot_state(), self._checkpoint_meta())

    def load_checkpoint(self, filename_or_path: str):
        self._join_ckpt_writer()
        path = filename_or_path if os.path.isabs(filename_or_path) else os.path.join(
            self.output_folder, filename_or_path)
        arrays, meta = ckpt_lib.load_checkpoint(path)
        if self.network is None:
            self.initialize()
        self.params = jax.tree_util.tree_map(jnp.asarray, arrays["network_weights"])
        if "optimizer_state" in arrays:
            self.opt_state = pytree_to_optax_state(self.opt_state, arrays["optimizer_state"])
        self.current_epoch = meta.get("current_epoch", 0)
        self._best_ema = meta.get("_best_ema")
        self.step_counter = meta.get("step_counter", self.current_epoch * self.cfg.num_iterations_per_epoch)
        if meta.get("logging"):
            self.logger.load_checkpoint(meta["logging"])
        mirroring = meta.get("inference_allowed_mirroring_axes")
        if mirroring is not None:
            self.inference_allowed_mirroring_axes = tuple(mirroring)

    # --- training loop --------------------------------------------------------
    def run_training(self, continue_training: bool = False):
        if self.network is None:
            self.initialize()
        if continue_training:
            for candidate in ("checkpoint_latest.npz", "checkpoint_best.npz"):
                p = os.path.join(self.output_folder, candidate)
                if os.path.isfile(p):
                    self.print_to_log_file(f"resuming from {candidate}")
                    self.load_checkpoint(p)
                    break

        unpack_dataset(self.preprocessed_dataset_folder, num_processes=min(4, get_allowed_n_proc_DA()))
        self.get_dataloaders()
        rng = jax.random.PRNGKey(self.cfg.seed + 777)

        dummy_batch = dummy_val_batch = None
        if self.cfg.benchmark_no_dataloading:
            cm = self.configuration_manager
            num_in = determine_num_input_channels(self.plans_manager, cm, self.dataset_json)
            sample_patch = self.initial_patch_size if self.cfg.do_data_augmentation else tuple(cm.patch_size)
            local_bs = self._host_batch_spec()[0]

            def _dummy(spatial):
                return {
                    "data": np.random.rand(local_bs, *spatial, num_in).astype(np.float32),
                    "seg": np.random.randint(
                        0, max(2, len(self.label_manager.all_labels)),
                        (local_bs, *spatial, 1)).astype(np.int16),
                }

            # train dummies carry the augmentation margin (the train step
            # augments+crops in-jit); val consumes patch-size center crops.
            # Staged to the device ONCE: re-transferring the same dummy every
            # iteration would re-add the host link the no-dataloading
            # benchmark exists to exclude (reference analog keeps the dummy
            # batch GPU-resident, nnUNetTrainerBenchmark_5epochs_noDataLoading)
            d = _dummy(sample_patch)
            dummy_batch = {k: self._to_global(v) for k, v in d.items()}
            if self.cfg.num_val_iterations_per_epoch > 0:
                d = _dummy(tuple(cm.patch_size))
                dummy_val_batch = {k: self._to_global(v) for k, v in d.items()}

        # with the device cache, the host prefetch threads never start — the
        # host draws only (slot, origin) pairs and the device slices patches
        cache_tr = getattr(self, "device_cache_train", None)
        cache_val = getattr(self, "device_cache_val", None)
        train_iter = iter(self.loader_train) if cache_tr is None else None
        val_iter = iter(self.loader_val) if cache_val is None else None
        start_epoch = self.current_epoch
        try:
            for epoch in range(self.current_epoch, self.cfg.num_epochs):
                self.current_epoch = epoch
                t0 = time.time()
                self.logger.log("epoch_start_timestamps", t0, epoch)
                self.logger.log("lrs", float(self._lr_schedule(self.step_counter)), epoch)

                # optional JAX profiler trace of the FIRST epoch's steps only
                # (reference has no profiler integration; SURVEY.md §5 asks for one)
                profile_dir = os.environ.get("ATK_PROFILE_DIR")
                if profile_dir and epoch == start_epoch:
                    try:
                        jax.profiler.start_trace(profile_dir)
                        self._profiling = True
                    except Exception as e:
                        self.print_to_log_file(f"profiler start failed: {e}")
                        self._profiling = False

                train_losses = []
                for _ in range(self.cfg.num_iterations_per_epoch):
                    if dummy_batch is not None:
                        batch = dummy_batch
                    elif cache_tr is not None:
                        batch = self._cache_batch(cache_tr, self._cache_extract_train)
                    else:
                        batch = next(train_iter)
                    rng, sub = jax.random.split(rng)
                    self.params, self.opt_state, loss = self._train_step(
                        self.params, self.opt_state, sub,
                        self._to_global(batch["data"]), self._to_global(batch["seg"]),
                    )
                    self.step_counter += 1
                    if cache_tr is not None:
                        cache_tr.maybe_refill()
                    train_losses.append(loss)
                train_loss = float(np.mean(jax.device_get(train_losses)))
                if getattr(self, "_profiling", False):
                    try:
                        jax.profiler.stop_trace()
                        self.print_to_log_file(f"profiler trace written to {os.environ['ATK_PROFILE_DIR']}")
                    finally:
                        self._profiling = False
                if not np.isfinite(train_loss):
                    self.print_to_log_file(
                        f"WARNING: non-finite train loss at epoch {epoch}: {train_loss}")
                self.logger.log("train_losses", train_loss, epoch)

                if self.cfg.num_val_iterations_per_epoch > 0:
                    val_losses, tps, fps, fns = [], [], [], []
                    for _ in range(self.cfg.num_val_iterations_per_epoch):
                        if dummy_val_batch is not None:
                            batch = dummy_val_batch
                        elif cache_val is not None:
                            batch = self._cache_batch(cache_val,
                                                      self._cache_extract_val)
                            cache_val.maybe_refill()
                        else:
                            batch = next(val_iter)
                        rng, sub = jax.random.split(rng)
                        loss, tp, fp, fn = self._val_step(
                            self.params, sub, self._to_global(batch["data"]),
                            self._to_global(batch["seg"]))
                        val_losses.append(loss)
                        tps.append(tp); fps.append(fp); fns.append(fn)
                    val_loss = float(np.mean(jax.device_get(val_losses)))
                    tp = np.sum(jax.device_get(tps), 0)
                    fp = np.sum(jax.device_get(fps), 0)
                    fn = np.sum(jax.device_get(fns), 0)
                    dice_per_class = [
                        float(2 * i / (2 * i + j + k)) if (2 * i + j + k) > 0 else 0.0
                        for i, j, k in zip(tp, fp, fn)
                    ]
                    mean_fg_dice = float(np.nanmean(dice_per_class))
                    self.logger.log("val_losses", val_loss, epoch)
                    self.logger.log("dice_per_class_or_region", dice_per_class, epoch)
                    self.logger.log("mean_fg_dice", mean_fg_dice, epoch)
                self.on_epoch_end(epoch)
        finally:
            self._join_ckpt_writer()
            self.loader_train.stop()
            self.loader_val.stop()
            for cache in (cache_tr, cache_val):
                if cache is not None:
                    cache.stop()

        self.save_checkpoint("checkpoint_final.npz")
        latest = os.path.join(self.output_folder, "checkpoint_latest.npz")
        if os.path.isfile(latest):
            os.remove(latest)
        if self.cfg.benchmark:
            self._write_benchmark_result()

    def on_epoch_end(self, epoch: int):
        t1 = time.time()
        self.logger.log("epoch_end_timestamps", t1, epoch)
        lg = self.logger.logging
        dur = t1 - lg["epoch_start_timestamps"][epoch]
        self._epoch_times.append(dur)
        def _get(key):
            lst = lg[key]
            return lst[epoch] if len(lst) > epoch else None

        msg = f"epoch {epoch}: train_loss {lg['train_losses'][epoch]:.4f}"
        if _get("val_losses") is not None:
            msg += f" val_loss {_get('val_losses'):.4f}"
        if _get("ema_fg_dice") is not None:
            msg += f" ema_fg_dice {_get('ema_fg_dice'):.4f}"
        msg += f" time {dur:.2f}s"
        self.print_to_log_file(msg)

        need_latest = (epoch + 1) % self.cfg.save_every == 0 and epoch != self.cfg.num_epochs - 1
        ema = lg["ema_fg_dice"][epoch] if lg["ema_fg_dice"] and len(lg["ema_fg_dice"]) > epoch else None
        is_best = ema is not None and (self._best_ema is None or ema > self._best_ema)
        if is_best:
            self._best_ema = ema
            self.print_to_log_file(f"new best EMA pseudo Dice: {ema:.4f}")
        if ((need_latest or is_best) and not self.disable_checkpointing
                and jax.process_index() == 0):
            # one readback, both files, written off-thread
            snap = self._snapshot_state()
            meta = self._checkpoint_meta()
            jobs = []
            if need_latest:
                jobs.append(("checkpoint_latest.npz", snap, meta))
            if is_best:
                jobs.append(("checkpoint_best.npz", snap, meta))
            self._write_checkpoints_async(jobs)
        try:
            self.logger.plot_progress_png(self.output_folder)
        except Exception:
            pass

    def _write_benchmark_result(self):
        """Reference nnUNetTrainerBenchmark_5epochs: fastest epoch ->
        benchmark_result.json keyed by software/hardware fingerprint."""
        fastest = float(np.min(self._epoch_times)) if self._epoch_times else None
        out_file = os.path.join(self.output_folder, "benchmark_result.json")
        entry = {
            "jax_version": jax.__version__,
            "device": str(jax.devices()[0]),
            "num_devices": self.n_shards,
            "fastest_epoch": fastest,
            "trainer": self.cfg.name,
        }
        key = f"{jax.__version__}__{str(jax.devices()[0]).replace(' ', '_')}"
        existing = {}
        if os.path.isfile(out_file):
            existing = load_json(out_file)
        existing[key] = entry
        save_json(existing, out_file)

    # --- final validation -----------------------------------------------------
    def perform_actual_validation(self, save_probabilities: bool = False):
        from anatomask_tpu.inference.predictor import Predictor
        from anatomask_tpu.inference.export import export_prediction_from_logits, resample_and_save
        from anatomask_tpu.evaluation.metrics import compute_metrics_on_folder

        predictor = Predictor(
            tile_step_size=0.5, use_gaussian=True,
            use_mirroring=self.inference_allowed_mirroring_axes is not None,
            verbose=False,
        )
        # rebuild the network without deep supervision for inference
        cm = self.configuration_manager
        num_in = determine_num_input_channels(self.plans_manager, cm, self.dataset_json)
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        net_no_ds = build_network_from_plans(
            self.plans_manager, cm, num_in, self.label_manager.num_segmentation_heads,
            arch_name=self.cfg.arch_name, deep_supervision=False, dtype=dtype,
        )
        predictor.manual_initialization(
            net_no_ds, self.plans_manager, cm, [self.params],
            self.dataset_json, self.inference_allowed_mirroring_axes,
        )
        validation_output_folder = os.path.join(self.output_folder, "validation")
        os.makedirs(validation_output_folder, exist_ok=True)
        _, val_keys = self.do_split()
        if jax.process_count() > 1:
            # DDP-style validation key sharding (reference nnUNetTrainer.py:
            # 1132-1133, val_keys[rank::world]); each host predicts its slice,
            # host 0 computes the metrics afterwards
            val_keys = val_keys[jax.process_index()::jax.process_count()]
        dataset_val = CaseDataset(self.preprocessed_dataset_folder, val_keys)

        next_stages = cm.next_stage_names
        for k in val_keys:
            data, seg, properties = dataset_val.load_case(k)
            data = np.asarray(data)
            logits = predictor.predict_sliding_window_return_logits(data)
            export_prediction_from_logits(
                logits, properties, cm, self.plans_manager, self.dataset_json,
                os.path.join(validation_output_folder, k), save_probabilities,
            )
            if next_stages is not None:
                for ns in next_stages:
                    next_cm = self.plans_manager.get_configuration(ns)
                    pp_next = os.path.join(self.preprocessed_dataset_folder_base, next_cm.data_identifier)
                    try:
                        tgt_shape = np.load(os.path.join(pp_next, k + ".npz"))["data"].shape[1:]
                    except FileNotFoundError:
                        continue
                    out_dir = os.path.join(self.output_folder_base, "predicted_next_stage", ns)
                    os.makedirs(out_dir, exist_ok=True)
                    resample_and_save(
                        logits, tgt_shape, os.path.join(out_dir, k + ".npz"),
                        self.plans_manager, cm, properties, self.dataset_json,
                    )

        if jax.process_count() > 1 and jax.process_index() != 0:
            return None  # host 0 computes metrics once all shards are written
        gt_folder = os.path.join(self.preprocessed_dataset_folder_base, "gt_segmentations")
        if not os.path.isdir(gt_folder):
            gt_folder = os.path.join(
                require("raw"), self.plans_manager.dataset_name, "labelsTr")
        metrics = compute_metrics_on_folder(
            gt_folder, validation_output_folder,
            os.path.join(validation_output_folder, "summary.json"),
            self.plans_manager.image_reader_writer_class(),
            self.dataset_json["file_ending"],
            self.label_manager.foreground_regions if self.label_manager.has_regions
            else self.label_manager.foreground_labels,
            self.label_manager.ignore_label,
        )
        self.print_to_log_file("Validation complete. Mean Dice:", metrics["foreground_mean"]["Dice"])
        return metrics


# --- optax state (de)serialization helpers ------------------------------------

def optax_state_to_pytree(opt_state):
    """Flatten an optax state into a plain nested structure of arrays."""
    leaves, _ = jax.tree_util.tree_flatten(opt_state)
    return {"__leaves__": list(leaves)}


def pytree_to_optax_state(template_state, saved):
    leaves = saved["__leaves__"]
    t_leaves, treedef = jax.tree_util.tree_flatten(template_state)
    if len(leaves) != len(t_leaves):
        return template_state  # structure changed; keep fresh state
    leaves = [jnp.asarray(l).astype(t.dtype) if hasattr(t, "dtype") else l
              for l, t in zip(leaves, t_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
