"""MIM pretraining drivers: SparK (random mask) and AnatoMask (teacher-guided).

Capability parity: /root/reference/nnunetv2/training/nnUNetTrainer/variants/
pretrain/pretrain.py (SparK driver: STUNet head -> SparseEncoder ->
LightDecoder -> SparK(mask_ratio .6, densify 'in'); nnU-Net data pipeline with
oversample 0.33; spatial-only augmentation; AdamW + no-decay groups;
LinearWarmupCosine(warmup 20); grad-clip 12; NaN abort; per-epoch val loss;
best/latest checkpoints; progress plot) and pretrain_AntoMask.py (teacher-
student: EMA decay 0.999->0.9999 over the first quarter; per step random mask
-> teacher reconstructs -> per-patch loss -> generate_mask(guide, epoch) ->
student forward/backward on the hard mask -> EMA update; epoch-EMA loss
tracking alpha=0.9). DDP variants (pretrain_DDP.py, pretrain_AnatoMask_DDP.py)
correspond to running the same jitted step over a data mesh.

TPU redesign: the reference does TWO sequential device forwards + one backward
per step with a CPU round-trip for mask generation (SURVEY.md §3.2); here
teacher forward, guided mask generation, student forward/backward, optimizer
update and EMA update are ONE jitted SPMD program — no host sync inside the
step. The edit-the-file constant blocks of the reference scripts become the
PretrainConfig dataclass.
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
from jax.sharding import NamedSharding, PartitionSpec as P

from anatomask_tpu.configuration import get_allowed_n_proc_DA
from anatomask_tpu.data.augment import (
    AugmentConfig,
    IntensityAugmentConfig,
    SpatialAugmentConfig,
    make_train_augment_fn,
    rotation_ranges_and_initial_patch_size,
)
from anatomask_tpu.data.dataset import CaseDataset, unpack_dataset
from anatomask_tpu.data.pipeline import PrefetchPipeline
from anatomask_tpu.data.sampler import PatchSampler
from anatomask_tpu.paths import require
from anatomask_tpu.plans.plans_handler import PlansManager, load_json, save_json
from anatomask_tpu.ssl.anatomask import generate_guided_mask, guided_keep_ratio
from anatomask_tpu.ssl.decoder import LightDecoder
from anatomask_tpu.ssl.ema import ema_decay_schedule, ema_update
from anatomask_tpu.ssl.spark import SparK, spark_loss
from anatomask_tpu.ssl.sparse import SparseSTUNetEncoder
from anatomask_tpu.training import checkpoint as ckpt_lib
from anatomask_tpu.training.schedules import linear_warmup_cosine_schedule
from anatomask_tpu.training.trainer import pick_mesh_for_batch

_STUNET_WIDTHS = {"S": 16, "B": 32, "L": 64, "H": 96}


@dataclass(frozen=True)
class PretrainConfig:
    """Replaces the reference scripts' edit-me constant blocks
    (pretrain_AntoMask.py:181-243)."""
    method: str = "anatomask"            # "spark" (random mask) | "anatomask"
    model_size: str = "B"                # STUNet S/B/L/H encoder head
    patch_size: Tuple[int, int, int] = (112, 112, 128)
    batch_size: int = 4
    mask_ratio: float = 0.6
    densify_norm: str = "in"
    # LightDecoder norm: the reference builds its decoder with BatchNorm3d
    # (pretrain_AntoMask.py:212 LightDecoder(..., sbn=False) -> nn.BatchNorm3d,
    # decoder3D.py:44-47). Our default is "in" (per-sample): it makes
    # microbatch grad accumulation exact and is what all shipped perf/accuracy
    # numbers use; pass "bn" for reference-exact decoder semantics
    # (tests/test_reference_parity.py pins full-model equality in that mode).
    decoder_norm: str = "in"
    decoder_width: Optional[int] = None  # default: encoder top width
    # reference-fidelity mode: every InstanceNorm on the masked path (encoder
    # blocks + densify norms) pools statistics across the whole batch's active
    # voxels, the reference's exact B>1 law (encoder3D.py:153; at B=1 the laws
    # coincide). Default False = per-sample InstanceNorm — the documented
    # semantics, keeps microbatch grad accumulation exact, and is what all
    # shipped perf/accuracy numbers use. Set True (with decoder_norm="bn") for
    # reference-exact full-model parity at the shipped batch size 4
    # (tests/test_reference_parity.py).
    norm_batch_pooled: bool = False
    num_epochs: int = 1000
    iters_per_epoch: Optional[int] = None  # default floor(n_train / batch)
    lr: float = 1e-4                     # spark driver uses 2e-4
    optimizer: str = "adamw"             # adamw | lamb (reference vendored lamb.py)
    weight_decay: float = 1e-5
    warmup_epochs: int = 20
    grad_clip: float = 12.0
    oversample_foreground_percent: float = 0.33
    val_fraction: float = 0.15           # train_test_split(test_size=.15, seed 42)
    ema_decay_start: float = 0.999
    ema_decay_end: float = 0.9999
    guide: bool = True                   # easy-to-hard curriculum
    compute_dtype: str = "bfloat16"
    num_workers: Optional[int] = None
    seed: int = 42
    save_every: int = 1
    remat: bool = False                  # gradient checkpointing (GC.py parity)
    # microbatch gradient accumulation: every norm in the pretraining path is
    # per-sample (InstanceNorm/LayerNorm), so accumulating microbatch grads is
    # EXACTLY the full-batch gradient while halving/quartering the activation
    # peak (the reference bs-4 112x112x128 STUNet-B workload needs 2 to fit
    # 16G HBM). NOT exact for densify_norm="bn" (cross-sample stats).
    grad_accum_steps: int = 1
    scale_batch_to_devices: bool = True  # same policy as TrainerConfig
    # HBM-resident case cache (data/device_cache.py): host sends only
    # (slot, origin) pairs per step; patches are sliced out of HBM on device.
    # None = auto (on for single-process runs; ATK_DEVICE_CACHE=0 disables).
    device_cache: Optional[bool] = None
    device_cache_mb: int = 1024
    # override the encoder topology (None -> STUNet head presets; used for
    # small-scale tests and research variants)
    encoder_dims: Optional[Tuple[int, ...]] = None
    encoder_depth: Optional[Tuple[int, ...]] = None
    encoder_type: str = "stunet"         # "stunet" | "mednext"


def build_spark_model(cfg: PretrainConfig, in_channels: int = 1) -> SparK:
    dtype0 = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if cfg.encoder_type == "mednext":
        from anatomask_tpu.ssl.mednext import SparseMedNeXtEncoder
        n = cfg.encoder_dims[0] if cfg.encoder_dims else 32
        enc = SparseMedNeXtEncoder(n_channels=n, dtype=dtype0, remat=cfg.remat)
        dec_width = cfg.decoder_width or enc.get_feature_map_channels()[-1]
        dec = LightDecoder(up_sample_ratio=16, width=dec_width, norm=cfg.decoder_norm,
                           out_channels=in_channels, dtype=dtype0, remat=cfg.remat)
        return SparK(sparse_encoder=enc, dense_decoder=dec,
                     input_size=tuple(cfg.patch_size), mask_ratio=cfg.mask_ratio,
                     densify_norm=cfg.densify_norm, dtype=dtype0)
    mult = _STUNET_WIDTHS[cfg.model_size.upper()]
    dims = list(cfg.encoder_dims) if cfg.encoder_dims else [mult * x for x in (1, 2, 4, 8, 16)]
    depth_map = {"S": 1, "B": 1, "L": 2, "H": 3}
    depth = (tuple(cfg.encoder_depth) if cfg.encoder_depth
             else (depth_map[cfg.model_size.upper()],) * len(dims))
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    remat = cfg.remat or cfg.model_size.upper() == "H"
    r = 2 ** (len(dims) - 1)
    fmap = [int(p) // r for p in cfg.patch_size]
    len_keep = round(int(np.prod(fmap)) * (1 - cfg.mask_ratio))
    enc = SparseSTUNetEncoder(depth=depth, dims=dims, dtype=dtype, remat=remat,
                              folded_feats=True, len_keep=len_keep,
                              norm_batch_pooled=cfg.norm_batch_pooled)
    dec_width = cfg.decoder_width or dims[-1]
    dec = LightDecoder(up_sample_ratio=2 ** (len(dims) - 1), width=dec_width,
                       norm=cfg.decoder_norm, out_channels=in_channels,
                       dtype=dtype, remat=remat)
    return SparK(
        sparse_encoder=enc, dense_decoder=dec, input_size=tuple(cfg.patch_size),
        mask_ratio=cfg.mask_ratio, densify_norm=cfg.densify_norm, dtype=dtype,
        norm_batch_pooled=cfg.norm_batch_pooled,
    )


def no_decay_mask(params) -> Any:
    """True = apply weight decay. The reference excludes 1-D params, biases,
    mask tokens and norm gammas (utils/lr_control.py:32-53)."""
    def decide(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if "mask_token" in name or "bias" in name or "scale" in name:
            return False
        return np.ndim(leaf) > 1
    return jax.tree_util.tree_map_with_path(decide, params)


class PretrainTrainer:
    def __init__(
        self,
        dataset_name_or_id,
        config: PretrainConfig = PretrainConfig(),
        plans_identifier: str = "ATKPlans",
        configuration: str = "3d_fullres",
        fold: int = 0,
        output_folder: Optional[str] = None,
    ):
        from anatomask_tpu.utils.helpers import maybe_convert_to_dataset_name
        self.cfg = config
        self.dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
        pp_base = os.path.join(require("preprocessed"), self.dataset_name)
        self.plans_manager = PlansManager(os.path.join(pp_base, plans_identifier + ".json"))
        self.configuration_manager = self.plans_manager.get_configuration(configuration)
        self.dataset_json = load_json(os.path.join(pp_base, "dataset.json"))
        self.preprocessed_folder = os.path.join(pp_base, self.configuration_manager.data_identifier)
        self.fold = fold
        self.output_folder = output_folder or os.path.join(
            require("results"), self.dataset_name,
            f"pretrain_{config.method}_{config.model_size}",
        )
        os.makedirs(self.output_folder, exist_ok=True)
        self.label_manager = self.plans_manager.get_label_manager(self.dataset_json)
        self.num_input_channels = len(
            self.dataset_json.get("channel_names", self.dataset_json.get("modality")))
        self.model = build_spark_model(config, self.num_input_channels)
        self.current_epoch = 0
        self._log: List[str] = []

    def print_to_log_file(self, *args):
        line = " ".join(str(a) for a in args)
        print(line, flush=True)
        with open(os.path.join(self.output_folder, "pretrain_log.txt"), "a") as f:
            f.write(line + "\n")

    # --- data -----------------------------------------------------------------
    def _split_keys(self) -> Tuple[List[str], List[str]]:
        """Fold train keys, then an internal train/val split (reference
        train_test_split(test_size=0.15, random_state=42) on the fold's train
        keys, pretrain.py:272)."""
        from anatomask_tpu.training.trainer import generate_crossval_split
        all_keys = sorted(CaseDataset(self.preprocessed_folder).keys())
        splits_file = os.path.join(os.path.dirname(self.preprocessed_folder), "splits_final.json")
        if os.path.isfile(splits_file):
            splits = load_json(splits_file)
        else:
            splits = generate_crossval_split(all_keys, 5, seed=12345)
            save_json(splits, splits_file)
        tr_keys = splits[self.fold]["train"] if self.fold < len(splits) else all_keys
        rng = np.random.RandomState(self.cfg.seed)
        idx = rng.permutation(len(tr_keys))
        n_val = max(1, int(round(len(tr_keys) * self.cfg.val_fraction)))
        val = [tr_keys[i] for i in idx[:n_val]]
        train = [tr_keys[i] for i in idx[n_val:]]
        return train, val

    def _mesh_spec(self):
        """(mesh, n_shards, global_batch) — cached; needed by both the sampler
        construction and the jitted steps."""
        if not hasattr(self, "mesh") or self.mesh is None:
            self.mesh, self.n_shards, self.global_batch_size = pick_mesh_for_batch(
                self.cfg.batch_size,
                scale_batch_to_devices=self.cfg.scale_batch_to_devices,
                log=self.print_to_log_file)
        return self.mesh, self.n_shards, self.global_batch_size

    def _host_batch_spec(self) -> Tuple[int, float]:
        _, n_shards, global_bs = self._mesh_spec()
        nproc = jax.process_count()
        if nproc == 1:
            return global_bs, self.cfg.oversample_foreground_percent
        if global_bs % n_shards != 0:
            raise RuntimeError(
                f"multi-host pretraining needs global batch ({global_bs}) divisible "
                f"by the device count ({n_shards}); enable scale_batch_to_devices")
        from anatomask_tpu.parallel.mesh import compute_shard_batch_and_oversample
        return compute_shard_batch_and_oversample(
            global_bs, self.cfg.oversample_foreground_percent,
            jax.process_index(), nproc)

    def _to_global(self, arr) -> jax.Array:
        if jax.process_count() == 1:
            return jnp.asarray(arr)
        return jax.make_array_from_process_local_data(self._bsh, np.asarray(arr))

    def get_dataloaders(self):
        train_keys, val_keys = self._split_keys()
        ds_tr = CaseDataset(self.preprocessed_folder, train_keys)
        ds_val = CaseDataset(self.preprocessed_folder, val_keys)
        patch = tuple(self.cfg.patch_size)
        # spatial-only augmentation (reference pretrain transforms: rotation
        # +-30deg, scaling .7-1.4, mirroring; intensity transforms disabled)
        rot, dummy_2d, initial_patch, mirror_axes = rotation_ranges_and_initial_patch_size(patch)
        self.aug_config = AugmentConfig(
            spatial=SpatialAugmentConfig(
                patch_size=patch, rotation_x=tuple(rot["x"]), rotation_y=tuple(rot["y"]),
                rotation_z=tuple(rot["z"]), dummy_2d=dummy_2d,
            ),
            intensity=IntensityAugmentConfig(
                p_noise=0, p_blur=0, p_brightness=0, p_contrast=0, p_lowres=0,
                p_gamma=0, p_gamma_invert=0),
            mirror_axes=mirror_axes,
            ds_scales=(),
        )
        self.val_patch = patch
        annotated_key = tuple(self.label_manager.all_labels)
        local_bs, local_os = self._host_batch_spec()
        self.sampler_train = PatchSampler(
            ds_tr, local_bs, tuple(int(i) for i in initial_patch),
            final_patch_size=patch,
            oversample_foreground_percent=local_os,
            annotated_classes_key=annotated_key,
            has_ignore=self.label_manager.has_ignore_label,
            seed=self.cfg.seed + 131071 * jax.process_index(),
            load_seg=False,  # SSL: labels only steer oversampling
        )
        self.sampler_val = PatchSampler(
            ds_val, local_bs, patch, final_patch_size=patch,
            oversample_foreground_percent=local_os,
            annotated_classes_key=annotated_key,
            has_ignore=self.label_manager.has_ignore_label,
            seed=self.cfg.seed + 1 + 131071 * jax.process_index(),
            load_seg=False,
        )
        n_workers = self.cfg.num_workers if self.cfg.num_workers is not None else min(
            4, get_allowed_n_proc_DA())
        tdt = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else None
        use_cache = self.cfg.device_cache
        if use_cache is None:
            use_cache = (jax.process_count() == 1
                         and os.environ.get("ATK_DEVICE_CACHE", "1") == "1")
        self.device_cache = None
        self.device_cache_val = None
        if use_cache:
            from anatomask_tpu.data.device_cache import DeviceCaseCache
            self.device_cache = DeviceCaseCache(
                ds_tr,
                initial_patch=tuple(int(i) for i in initial_patch),
                final_patch=patch,
                capacity_mb=self.cfg.device_cache_mb,
                oversample_foreground_percent=local_os,
                annotated_classes_key=annotated_key,
                has_ignore=self.label_manager.has_ignore_label,
                batch_size=local_bs,
                dtype=tdt or jnp.float32,
                seed=self.cfg.seed + 77,
                whole_dataset_mode=True,
            )
            if self.device_cache.whole_dataset_resident:
                self.print_to_log_file(
                    "[device-cache] whole training set resident; refills off")
            else:
                # turnover target: each slot refreshed about once per epoch
                iters_hint = self.cfg.iters_per_epoch or 250
                self.device_cache.start_refill(
                    steps_per_slot=max(1, iters_hint // self.device_cache.num_slots))
            self.print_to_log_file(
                f"[device-cache] {self.device_cache.num_slots} slots of "
                f"{self.device_cache.slot_shape} in HBM "
                f"(~{self.cfg.device_cache_mb} MB budget); host sends only "
                f"(slot, origin) pairs per step")
            # validation patches come out of HBM too: the per-epoch val loop
            # otherwise streams ~n_val full batches through the host link
            # (slow-session tunnel: 10+ s/epoch, and every H2D leaks its host
            # buffer on the dev tunnel — CLAUDE.md)
            self.device_cache_val = DeviceCaseCache(
                ds_val, initial_patch=patch, final_patch=patch,
                capacity_mb=max(128, self.cfg.device_cache_mb // 4),
                oversample_foreground_percent=local_os,
                annotated_classes_key=annotated_key,
                has_ignore=self.label_manager.has_ignore_label,
                batch_size=local_bs,
                dtype=tdt or jnp.float32,
                seed=self.cfg.seed + 78,
                whole_dataset_mode=True,
            )
            if not self.device_cache_val.whole_dataset_resident:
                # advisor (round 4): best_val checkpoint selection runs through
                # this cache; when it is NOT whole-dataset resident, val
                # patches come from a rotating random window (refill cadence
                # bounded by the credit cap), so the val-loss distribution can
                # drift from the host-pipeline definition. Surface it.
                self.print_to_log_file(
                    "[device-cache] WARNING: val cache holds "
                    f"{self.device_cache_val.num_slots} of "
                    f"{len(ds_val)} val cases — val loss samples a rotating "
                    "window, not the full split; raise device_cache_mb to "
                    "make best-checkpoint selection window-independent")
                self.device_cache_val.start_refill(steps_per_slot=max(
                    1, max(1, (self.cfg.iters_per_epoch or 250) // 5)
                    // self.device_cache_val.num_slots))
        # SSL uses no labels on-device: seg stays on the host (it only feeds
        # the sampler's fg-oversampling), saving ~1/3 of the H2D bytes
        self.loader_train = PrefetchPipeline(
            self.sampler_train,
            num_workers=1 if self.device_cache is not None else n_workers,
            # multi-host assembles global arrays itself (_to_global)
            device_put=jax.process_count() == 1, transfer_dtype=tdt,
            drop_keys=("seg",))
        self.loader_val = PrefetchPipeline(self.sampler_val, num_workers=1,
                                           drop_keys=("seg",))
        self.n_train = len(train_keys)
        return self.loader_train, self.loader_val

    # --- initialization -------------------------------------------------------
    def initialize(self):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        example = jnp.zeros((1, *cfg.patch_size, self.num_input_channels), dtype)
        dummy_active = self.model.mask(rng, 1)
        variables = self.model.init(rng, example, dummy_active)
        self.params = variables["params"]
        # distinct buffers: both params and ema are donated by the jitted step
        self.ema_params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), self.params)

        iters = cfg.iters_per_epoch or max(1, getattr(self, "n_train", 100) // cfg.batch_size)
        self.iters_per_epoch = iters
        # chunked scan size (device-cache path): largest divisor of
        # iters_per_epoch <= ATK_STEP_CHUNK (default 10); 1 disables
        self._step_chunk = 1
        if self.device_cache is not None:
            target = int(os.environ.get("ATK_STEP_CHUNK", "10"))
            for k in range(2, min(target, iters) + 1):
                if iters % k == 0:
                    self._step_chunk = k
            if self._step_chunk > 1:
                self.print_to_log_file(
                    f"[chunked-scan] {self._step_chunk} train steps per "
                    f"dispatch (extract+augment+step inside one jitted scan)")
        total_steps = cfg.num_epochs * iters
        self.lr_schedule = linear_warmup_cosine_schedule(
            cfg.lr, warmup_steps=cfg.warmup_epochs * iters, total_steps=total_steps,
            warmup_start_lr=1e-6,
        )
        if cfg.optimizer == "lamb":
            opt = optax.lamb(self.lr_schedule, weight_decay=cfg.weight_decay,
                             mask=no_decay_mask(self.params))
        else:
            opt = optax.adamw(self.lr_schedule, weight_decay=cfg.weight_decay,
                              mask=no_decay_mask(self.params))
        self.optimizer = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
        self.opt_state = self.optimizer.init(self.params)
        self.step_counter = 0
        self._build_steps()

    def _build_steps(self):
        cfg = self.cfg
        mesh, n_shards, global_bs = self._mesh_spec()
        micro = max(1, int(cfg.grad_accum_steps))
        while micro > 1 and (global_bs % micro != 0
                             or (global_bs // micro) % n_shards != 0):
            micro -= 1
        if micro != cfg.grad_accum_steps:
            self.print_to_log_file(
                f"[accum] grad_accum_steps adjusted {cfg.grad_accum_steps} -> {micro} "
                f"(global batch {global_bs}, {n_shards} shards)")
        self.grad_accum_steps = micro
        repl = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("data"))
        self._bsh = bsh
        augment_fn = make_train_augment_fn(self.aug_config)
        model = self.model
        optimizer = self.optimizer
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        def prep(rng, data):
            if self.aug_config.spatial.p_rotation > 0 or data.shape[1:4] != tuple(cfg.patch_size):
                data, _ = augment_fn(rng, data, None)  # data-only SSL path
            return data.astype(dtype)

        def _accumulate(micro_grads_fn, x, keys, params_like):
            """Microbatch accumulation via lax.scan (exact: per-sample norms
            only). The scan FORCES sequential microbatch execution so only one
            microbatch's activations are live at a time — unrolled accumulation
            lets XLA interleave them and blow HBM (measured: the reference
            bs-4 112x112x128 STUNet-B workload then fits WITHOUT remat, 5.14
            vs 4.20 patches/s on v5e; PLAN.md round-2)."""
            if micro == 1:
                loss, grads = micro_grads_fn(keys[0], x)
                return grads, loss
            mb = x.shape[0] // micro
            xs = x.reshape(micro, mb, *x.shape[1:])

            def body(acc, inp):
                k_i, xb = inp
                loss_i, g_i = micro_grads_fn(k_i, xb)
                return jax.tree_util.tree_map(jnp.add, acc, g_i), loss_i

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params_like)
            grads, losses = jax.lax.scan(body, zeros, (keys, xs))
            grads = jax.tree_util.tree_map(lambda g: g / micro, grads)
            return grads, jnp.mean(losses)

        def spark_step(params, opt_state, rng, data):
            ks = jax.random.split(rng, micro + 1)
            k_aug, keys = ks[0], ks[1:]  # keys stays a key ARRAY (scan input)
            x = prep(k_aug, data)

            def micro_grads(k, xb):
                active = model.mask(k, xb.shape[0])

                def loss_fn(p):
                    inp, rec = model.apply({"params": p}, xb, active)
                    return spark_loss(inp, rec, active)[0]

                return jax.value_and_grad(loss_fn)(params)

            grads, loss = _accumulate(micro_grads, x, keys, params)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt, loss

        def anatomask_step(params, ema_params, opt_state, rng, data,
                           ema_decay, len_loss):
            ks = jax.random.split(rng, micro + 1)
            k_aug, keys = ks[0], ks[1:]  # keys stays a key ARRAY (scan input)
            x = prep(k_aug, data)

            def micro_grads(k, xb):
                k_mask1, k_mask2 = jax.random.split(k)
                # teacher pass under a random mask
                mask1 = model.mask(k_mask1, xb.shape[0])
                inp1, rec1 = model.apply(
                    {"params": jax.lax.stop_gradient(ema_params)}, xb, mask1)
                _, teacher_loss_map = spark_loss(inp1, rec1, mask1)
                hard_mask, _ = generate_guided_mask(
                    k_mask2, teacher_loss_map, model.fmap, model.len_keep, len_loss)

                def loss_fn(p):
                    inp, rec = model.apply({"params": p}, xb, hard_mask)
                    return spark_loss(inp, rec, hard_mask)[0]

                return jax.value_and_grad(loss_fn)(params)

            grads, loss = _accumulate(micro_grads, x, keys, params)
            updates, new_opt = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_ema = ema_update(ema_params, new_params, ema_decay)
            return new_params, new_ema, new_opt, loss

        def val_step(params, rng, data):
            x = data.astype(dtype)
            active = model.mask(rng, x.shape[0])
            inp, rec = model.apply({"params": params}, x, active)
            return spark_loss(inp, rec, active)[0]

        if cfg.method == "spark":
            self._spark_step = jax.jit(
                spark_step,
                in_shardings=(repl, repl, repl, bsh),
                out_shardings=(repl, repl, repl), donate_argnums=(0, 1),
            )
        else:
            # len_loss is traced: the per-epoch curriculum changes it WITHOUT
            # recompiling the step (generate_guided_mask handles traced len_loss)
            self._anatomask_step = jax.jit(
                anatomask_step,
                in_shardings=(repl, repl, repl, repl, bsh, repl, repl),
                out_shardings=(repl, repl, repl, repl),
                donate_argnums=(0, 1, 2),
            )
        self._val_step = jax.jit(val_step, in_shardings=(repl, repl, bsh),
                                 out_shardings=repl)

        # chunked scan training (device-cache path): K steps of
        # extract -> augment -> train inside ONE jitted dispatch. Per-iter
        # dispatches through the remote tunnel cost ~30-50 ms each (3-4 per
        # iter: rng split, extract, step); chunking removes them all. The
        # host pre-draws the chunk's (slot, origin) pairs; slot refills are
        # applied only between chunks so meta stays consistent within one.
        if self.device_cache is not None:
            from anatomask_tpu.data.device_cache import _extract_patches
            ipatch = tuple(int(p) for p in self.device_cache.initial_patch)

            # commit the cache (and future refills) to the mesh as replicated:
            # without this a multi-device jit re-broadcasts the whole cache
            # on every chunk dispatch
            if self.device_cache.sharding is None:
                self.device_cache.sharding = repl
                self.device_cache.cache = jax.device_put(
                    self.device_cache.cache, repl)

            def _chunk_scan(step_core, state, rng, cache, slots, origins):
                ks = jax.random.split(rng, slots.shape[0])

                def body(st, inp):
                    k_i, s_i, o_i = inp
                    data = _extract_patches(cache, s_i, o_i, ipatch)
                    data = jax.lax.with_sharding_constraint(data, bsh)
                    out = step_core(*st, k_i, data)
                    return out[:-1], out[-1]

                st, losses = jax.lax.scan(body, state, (ks, slots, origins))
                return (*st, losses)

            def spark_chunk(params, opt_state, rng, cache, slots, origins):
                return _chunk_scan(spark_step_core, (params, opt_state),
                                   rng, cache, slots, origins)

            def anatomask_chunk(params, ema_params, opt_state, rng, cache,
                                slots, origins, ema_decay, len_loss):
                def core(p, e, o, k, data):
                    return anatomask_step(p, e, o, k, data, ema_decay,
                                          len_loss)
                return _chunk_scan(core, (params, ema_params, opt_state),
                                   rng, cache, slots, origins)

            def spark_step_core(p, o, k, data):
                return spark_step(p, o, k, data)

            # chunked validation: ONE jitted dispatch extracts + scores all
            # n_val batches from the val cache (replaces n_val host batch
            # transfers + n_val dispatches per epoch)
            if self.device_cache_val is not None:
                vpatch = tuple(int(p) for p in self.device_cache_val.initial_patch)
                if self.device_cache_val.sharding is None:
                    self.device_cache_val.sharding = repl
                    self.device_cache_val.cache = jax.device_put(
                        self.device_cache_val.cache, repl)

                def val_chunk(params, rng, cache, slots, origins):
                    ks = jax.random.split(rng, slots.shape[0])

                    def body(carry, inp):
                        k_i, s_i, o_i = inp
                        data = _extract_patches(cache, s_i, o_i, vpatch)
                        data = jax.lax.with_sharding_constraint(data, bsh)
                        return carry, val_step(params, k_i, data)

                    _, losses = jax.lax.scan(body, 0, (ks, slots, origins))
                    return losses

                self._val_chunk = jax.jit(
                    val_chunk,
                    in_shardings=(repl, repl, self.device_cache_val.sharding,
                                  repl, repl),
                    out_shardings=repl)

            cache_sh = (self.device_cache.sharding if
                        self.device_cache.sharding is not None else repl)
            if cfg.method == "spark":
                self._spark_chunk = jax.jit(
                    spark_chunk,
                    in_shardings=(repl, repl, repl, cache_sh, repl, repl),
                    out_shardings=(repl, repl, repl),
                    donate_argnums=(0, 1),
                )
            else:
                self._anatomask_chunk = jax.jit(
                    anatomask_chunk,
                    in_shardings=(repl, repl, repl, repl, cache_sh, repl,
                                  repl, repl, repl),
                    out_shardings=(repl, repl, repl, repl),
                    donate_argnums=(0, 1, 2),
                )

    # --- checkpointing --------------------------------------------------------
    def _snapshot_state(self) -> dict:
        """ONE host readback of the full training state (~850 MB for STUNet-B:
        params + EMA + AdamW moments). The tunnel readback dominates checkpoint
        cost, so epoch saves snapshot once and write latest/head/best from the
        same arrays."""
        from anatomask_tpu.training.trainer import optax_state_to_pytree
        return jax.device_get({
            "network_weights": self.params,
            "ema_weights": self.ema_params,
            "optimizer_state": optax_state_to_pytree(self.opt_state),
        })

    def _checkpoint_meta(self, extra_meta: Optional[dict] = None) -> dict:
        meta = {
            "method": self.cfg.method,
            "model_size": self.cfg.model_size,
            "current_epoch": self.current_epoch + 1,
            "spark_config": self.model.get_config(),
            "pretrain_config": {k: (list(v) if isinstance(v, tuple) else v)
                                for k, v in self.cfg.__dict__.items()},
        }
        meta.update(extra_meta or {})
        return meta

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
        """jobs: [(filename, arrays, meta)] written on a background thread so
        the npz serialization overlaps the next epoch's device steps (arrays
        are already host numpy — no device access from the thread). At most
        one writer is outstanding; a second epoch save joins the first.
        Write failures (disk full, permissions) are captured and re-raised at
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

    def save_checkpoint(self, filename: str, extra_meta: Optional[dict] = None,
                        arrays: Optional[dict] = None):
        if jax.process_index() != 0:
            return  # replicated params: host 0 writes for everyone
        self._join_ckpt_writer()
        if arrays is None:
            arrays = self._snapshot_state()
        ckpt_lib.save_checkpoint(os.path.join(self.output_folder, filename),
                                 arrays, self._checkpoint_meta(extra_meta))

    def load_checkpoint(self, filename: str):
        self._join_ckpt_writer()
        path = filename if os.path.isabs(filename) else os.path.join(self.output_folder, filename)
        arrays, meta = ckpt_lib.load_checkpoint(path)
        # verify architecture config matches (reference SparK.load_state_dict :192-204)
        saved_cfg = meta.get("spark_config", {})
        for k, v in self.model.get_config().items():
            if k in saved_cfg and saved_cfg[k] != v:
                raise AttributeError(
                    f"SparK config mismatch on load: this.{k}={v} ckpt.{k}={saved_cfg[k]}")
        self.params = jax.tree_util.tree_map(jnp.asarray, arrays["network_weights"])
        if "ema_weights" in arrays:
            self.ema_params = jax.tree_util.tree_map(jnp.asarray, arrays["ema_weights"])
        if "optimizer_state" in arrays:
            from anatomask_tpu.training.trainer import pytree_to_optax_state
            self.opt_state = pytree_to_optax_state(self.opt_state, arrays["optimizer_state"])
        self.current_epoch = meta.get("current_epoch", 0)

    # --- training loop --------------------------------------------------------
    def run_pretraining(self, continue_training: bool = False):
        unpack_dataset(self.preprocessed_folder, num_processes=min(4, get_allowed_n_proc_DA()))
        self.get_dataloaders()
        self.initialize()
        if continue_training:
            latest = os.path.join(self.output_folder, "checkpoint_latest.npz")
            if os.path.isfile(latest):
                self.load_checkpoint(latest)
                self.print_to_log_file(f"resumed at epoch {self.current_epoch}")

        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed + 999)
        train_iter = (iter(self.loader_train) if self.device_cache is None
                      else None)
        val_iter = (iter(self.loader_val) if self.device_cache_val is None
                    else None)
        history = {"train_loss": [], "val_loss": [], "ema_loss": []}
        best_val = np.inf
        ema_loss = None
        L = int(np.prod(self.model.fmap))

        try:
            for epoch in range(self.current_epoch, cfg.num_epochs):
                self.current_epoch = epoch
                t0 = time.time()
                ema_decay = ema_decay_schedule(
                    epoch, cfg.num_epochs, cfg.ema_decay_start, cfg.ema_decay_end)
                keep_ratio = guided_keep_ratio(epoch, cfg.num_epochs, cfg.guide)
                len_loss = int((L - self.model.len_keep) * keep_ratio)

                losses = []
                t_fetch = 0.0
                if self.device_cache is not None and self._step_chunk > 1:
                    # chunked scan path: ONE dispatch per K steps (see
                    # _chunk_scan). Host draws the chunk's (slot, origin)
                    # pairs; refills apply between chunks only.
                    K = self._step_chunk
                    for _ in range(self.iters_per_epoch // K):
                        f0 = time.time()
                        self.device_cache.maybe_refill(steps=K)
                        slots, origins = self.device_cache.sample_chunk(K)
                        t_fetch += time.time() - f0
                        rng, sub = jax.random.split(rng)
                        if cfg.method == "spark":
                            self.params, self.opt_state, lv = self._spark_chunk(
                                self.params, self.opt_state, sub,
                                self.device_cache.cache, jnp.asarray(slots),
                                jnp.asarray(origins))
                            self.ema_params = self.params
                        else:
                            (self.params, self.ema_params, self.opt_state,
                             lv) = self._anatomask_chunk(
                                self.params, self.ema_params, self.opt_state,
                                sub, self.device_cache.cache,
                                jnp.asarray(slots), jnp.asarray(origins),
                                jnp.float32(ema_decay), jnp.int32(len_loss))
                        self.step_counter += K
                        losses.append(lv)
                else:
                    for _ in range(self.iters_per_epoch):
                        f0 = time.time()
                        if self.device_cache is not None:
                            # HBM-resident path: host draws (slot, origin)
                            # pairs; the batch never crosses the host link.
                            # One staged slot refill applied between steps.
                            self.device_cache.maybe_refill()
                            slots, origins = self.device_cache.sample_batch()
                            data = self.device_cache.extract(slots, origins)
                            # the cache is committed replicated (chunk-jit
                            # plumbing); the per-iter step wants the batch
                            # sharded -> local reslice, no data movement
                            data = jax.device_put(data, self._bsh)
                        else:
                            batch = next(train_iter)
                            data = self._to_global(batch["data"])
                        t_fetch += time.time() - f0
                        rng, sub = jax.random.split(rng)
                        if cfg.method == "spark":
                            self.params, self.opt_state, loss = self._spark_step(
                                self.params, self.opt_state, sub, data)
                            self.ema_params = self.params
                        else:
                            self.params, self.ema_params, self.opt_state, loss = self._anatomask_step(
                                self.params, self.ema_params, self.opt_state, sub, data,
                                jnp.float32(ema_decay), jnp.int32(len_loss))
                        self.step_counter += 1
                        losses.append(loss)
                train_loss = float(np.mean(jax.device_get(losses)))
                t_train = time.time() - t0
                if not np.isfinite(train_loss):
                    raise RuntimeError(
                        f"Non-finite pretrain loss at epoch {epoch}: {train_loss}")
                # epoch EMA loss, alpha 0.9 (reference :456-461)
                ema_loss = train_loss if ema_loss is None else 0.9 * ema_loss + 0.1 * train_loss

                # validation loss under a fresh random mask
                tv0 = time.time()
                n_val = max(1, self.iters_per_epoch // 5)
                if self.device_cache_val is not None:
                    # one dispatch: extract + score all n_val batches from HBM
                    slots, origins = self.device_cache_val.sample_chunk(n_val)
                    rng, sub = jax.random.split(rng)
                    vlosses = self._val_chunk(
                        self.params, sub, self.device_cache_val.cache,
                        jnp.asarray(slots), jnp.asarray(origins))
                    self.device_cache_val.maybe_refill(n_val)
                else:
                    vlosses = []
                    for _ in range(n_val):
                        batch = next(val_iter)
                        rng, sub = jax.random.split(rng)
                        vlosses.append(self._val_step(
                            self.params, sub, self._to_global(batch["data"])))
                val_loss = float(np.mean(jax.device_get(vlosses)))
                t_val = time.time() - tv0

                history["train_loss"].append(train_loss)
                history["val_loss"].append(val_loss)
                history["ema_loss"].append(ema_loss)

                # checkpointing: ONE state readback per epoch; the npz writes
                # (latest + head + best, all from the same snapshot) run on a
                # background thread overlapping the next epoch's device steps
                tc0 = time.time()
                need_latest = (epoch + 1) % cfg.save_every == 0
                is_best = val_loss < best_val
                if is_best:
                    best_val = val_loss
                if (need_latest or is_best) and jax.process_index() == 0:
                    snap = self._snapshot_state()
                    jobs = []
                    if need_latest:
                        jobs.append(("checkpoint_latest.npz", snap,
                                     self._checkpoint_meta()))
                        jobs.append((f"{cfg.model_size}_head_latest.npz", snap,
                                     self._checkpoint_meta()))
                    if is_best:
                        jobs.append(("checkpoint_best.npz", snap,
                                     self._checkpoint_meta({"val_loss": val_loss})))
                    self._write_checkpoints_async(jobs)
                t_ckpt = time.time() - tc0
                self._plot_progress(history)
                self.print_to_log_file(
                    f"epoch {epoch}: train {train_loss:.4f} val {val_loss:.4f} "
                    f"ema {ema_loss:.4f} keep_ratio {keep_ratio:.3f} "
                    f"time {time.time() - t0:.1f}s "
                    f"(train {t_train:.1f}s [fetch-wait {t_fetch:.1f}s] "
                    f"val {t_val:.1f}s ckpt {t_ckpt:.1f}s)")
        finally:
            self._join_ckpt_writer()
            self.loader_train.stop()
            self.loader_val.stop()
            if self.device_cache is not None:
                self.device_cache.stop()
            if self.device_cache_val is not None:
                self.device_cache_val.stop()
        self.save_checkpoint("checkpoint_final.npz")
        with open(os.path.join(self.output_folder, "history.json"), "w") as f:
            json.dump(history, f)
        return history

    def _plot_progress(self, history):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(8, 5))
            ax.plot(history["train_loss"], label="train")
            ax.plot(history["val_loss"], label="val")
            ax.plot(history["ema_loss"], label="train (EMA)")
            ax.set_xlabel("epoch"); ax.set_ylabel("recon loss"); ax.legend()
            fig.savefig(os.path.join(self.output_folder, "progress.png"))
            plt.close(fig)
        except Exception:
            pass


def load_ssl_encoder_into_trainer(trainer, pretrain_checkpoint: str, verbose: bool = True):
    """Finetuning entry (reference run_finetuning_STUNet.py +
    load_stunet_ssl_weights): load the pretrained sparse-encoder subtree into a
    supervised Trainer's STUNet params."""
    from anatomask_tpu.training.checkpoint import transfer_ssl_encoder_weights
    arrays, meta = ckpt_lib.load_checkpoint(pretrain_checkpoint)
    ssl_params = arrays.get("network_weights", arrays)
    enc = ssl_params.get("sparse_encoder", ssl_params)
    if trainer.params is None:
        trainer.initialize()
    trainer.params = jax.tree_util.tree_map(
        jnp.asarray, transfer_ssl_encoder_weights(
            jax.tree_util.tree_map(np.asarray, trainer.params), enc, verbose=verbose))
    return trainer
