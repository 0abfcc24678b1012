"""Checkpoint save/load + weight-transfer contracts.

Capability parity:
- trainer checkpoint schema (network_weights / optimizer_state / current_epoch /
  logging / _best_ema / init_args / trainer_name / inference_allowed_mirroring_axes):
  /root/reference/nnunetv2/training/nnUNetTrainer/nnUNetTrainer.py:1041-1108.
- weight transfer library /root/reference/nnunetv2/run/load_pretrained_weights.py:
  * load_pretrained_weights (:6): name+shape-matched merge skipping seg heads
  * load_stunet_ssl_weights (:66): the AnatoMask->STUNet path — encoder keys
    rewritten by stripping the SparK 'sparse_encoder.sp_cnn.' prefix and loaded
    non-strictly into the encoder blocks.
- torch .pth interop so checkpoints trained with the reference load into the
  flax models for parity testing (kernel layout (O,I,kd,kh,kw)->(kd,kh,kw,I,O)).

Format: a single .npz holding the flattened pytree ('a/b/c' keys) plus a JSON
metadata entry — portable, no pickle, memory-mappable.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import numpy as np


SEP = "/"


def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}{SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}#{i}{SEP}"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split(SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix_lists(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            return [fix_lists(node[f"#{i}"]) for i in range(len(node))]
        return {k: fix_lists(v) for k, v in node.items()}

    return fix_lists(root)


def save_checkpoint(path: str, arrays: dict, metadata: Optional[dict] = None,
                    compress: bool = False):
    """arrays: pytree(s) of ndarrays (e.g. {'network_weights': params, ...});
    metadata: JSON-serializable dict. Uncompressed by default: zlib on
    hundreds of MB of fp32 weights costs tens of seconds PER EPOCH (the
    trainers save latest/best every epoch); set compress=True for archival
    copies. Loading accepts both."""
    flat = flatten_tree(jax.tree_util.tree_map(np.asarray, arrays))
    meta = json.dumps(metadata or {})
    tmp = path + ".tmp"
    saver = np.savez_compressed if compress else np.savez
    with open(tmp, "wb") as f:
        saver(f, __metadata__=np.frombuffer(meta.encode(), dtype=np.uint8), **flat)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[dict, dict]:
    """Returns (arrays pytree, metadata dict)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files if k != "__metadata__"}
        meta = json.loads(bytes(z["__metadata__"]).decode()) if "__metadata__" in z.files else {}
    return unflatten_tree(flat), meta


# --- reference-compatible weight transfer ------------------------------------

def _is_seg_head(path: str) -> bool:
    return "seg_outputs" in path or "seg_output" in path or ".seg_layers." in path


def load_pretrained_weights(params: dict, pretrained_params: dict, verbose: bool = False) -> dict:
    """Name+shape-matched merge of pretrained weights into `params`, skipping
    segmentation heads (reference load_pretrained_weights semantics: shape
    mismatch on a shared key is an error, missing keys are fine)."""
    flat = flatten_tree(params)
    flat_pre = flatten_tree(pretrained_params)
    loaded, skipped = [], []
    for k, v in flat_pre.items():
        if _is_seg_head(k):
            skipped.append(k)
            continue
        if k in flat:
            assert flat[k].shape == v.shape, (
                f"Shape mismatch for {k}: model {flat[k].shape} vs pretrained {v.shape}. "
                f"Pretrained weights must match the architecture."
            )
            flat[k] = np.asarray(v)
            loaded.append(k)
    if verbose:
        print(f"loaded {len(loaded)} tensors, skipped seg heads: {skipped}")
    return unflatten_tree(flat)


def transfer_ssl_encoder_weights(stunet_params: dict, ssl_encoder_params: dict,
                                 verbose: bool = False) -> dict:
    """The AnatoMask->STUNet finetuning path (reference load_stunet_ssl_weights):
    copy every encoder block tensor (conv_blocks_context_*) from the pretrained
    sparse encoder into the segmentation model, leave everything else (decoder,
    seg heads) at its initialization. Non-strict: tensors present in only one
    side are ignored."""
    flat = flatten_tree(stunet_params)
    flat_ssl = flatten_tree(ssl_encoder_params)
    worked, not_worked = [], []
    for k, v in flat_ssl.items():
        if "conv_blocks_context" not in k:
            continue
        if k in flat and flat[k].shape == v.shape:
            flat[k] = np.asarray(v)
            worked.append(k)
        else:
            not_worked.append(k)
    if verbose:
        print(f"ssl transfer: {len(worked)} loaded, {len(not_worked)} unmatched: {not_worked[:10]}")
    return unflatten_tree(flat)


# --- torch interop -----------------------------------------------------------

def convert_torch_stunet_state_dict(state_dict: dict) -> dict:
    """Convert a reference torch STUNet (or SparK sparse-encoder) state_dict into
    the flax param tree of anatomask_tpu.models.stunet.STUNet(Encoder).

    Handles DDP 'module.' prefixes and the SparK 'sparse_encoder.sp_cnn.'
    nesting (reference load_stunet_ssl_weights rewrites keys via
    split('sp_cnn.')[-1]; we do the same).
    """
    tree: dict = {}

    def put(path, arr):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr

    for key, val in state_dict.items():
        arr = np.asarray(getattr(val, "numpy", lambda: val)())
        k = key
        if "sp_cnn." in k:
            k = k.split("sp_cnn.")[-1]
        while k.startswith("module."):
            k = k[len("module."):]
        k = k.lstrip(".")  # moco rewrite (split('net')[1][3:]) can leave one
        parts = k.split(".")
        if parts[0] in ("conv_blocks_context", "conv_blocks_localization"):
            # conv_blocks_context.{stage}.{block}.{layer}.{param}
            stage, block, layer, pname = parts[1], parts[2], parts[3], parts[4]
            base = [f"{parts[0]}_{stage}", f"block{block}"]
            if layer.startswith("conv"):
                if pname == "weight":
                    put(base + [layer, "conv", "kernel"], arr.transpose(2, 3, 4, 1, 0))
                else:
                    put(base + [layer, "conv", "bias"], arr)
            elif layer.startswith("norm"):
                put(base + [layer, "scale" if pname == "weight" else "bias"], arr)
        elif parts[0] == "upsample_layers":
            u, layer, pname = parts[1], parts[2], parts[3]
            if pname == "weight":
                put([f"upsample_layers_{u}", layer, "conv", "kernel"], arr.transpose(2, 3, 4, 1, 0))
            else:
                put([f"upsample_layers_{u}", layer, "conv", "bias"], arr)
        elif parts[0] == "seg_outputs":
            u, pname = parts[1], parts[2]
            if pname == "weight":
                put([f"seg_outputs_{u}", "conv", "kernel"], arr.transpose(2, 3, 4, 1, 0))
            else:
                put([f"seg_outputs_{u}", "conv", "bias"], arr)
        # anything else (decoder densify layers, mask tokens, ...) is ignored here;
        # SSL-specific tensors are handled by the SSL checkpoint adapter.
    return tree


def convert_torch_spark_state_dict(state_dict: dict) -> dict:
    """Convert a FULL reference torch SparK pretraining state_dict (AnatoMask.py
    :14-77: sparse_encoder.sp_cnn STUNet head + densify_norms/densify_projs/
    mask_tokens + dense_decoder LightDecoder, decoder3D.py:13-53) into the flax
    param tree of anatomask_tpu.ssl.spark.SparK.

    Conv kernels: torch (O, I, kz, ky, kx) -> DHWIO. ConvTranspose kernels:
    torch (I, O, k, k, k) -> transpose to (k, k, k, I, O) + SPATIAL FLIP
    (lax.conv_transpose correlates with the un-flipped kernel; torch computes
    the true conv gradient). BatchNorm running stats / num_batches_tracked are
    dropped (our decoder norms are training-mode). Densify projs that are
    nn.Identity simply have no keys. Handles DDP 'module.' prefixes."""
    tree: dict = {}

    def put(path, arr):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(arr)

    enc_state = {}
    for key, val in state_dict.items():
        arr = _np(val)
        k = _strip_wrappers(key)
        parts = k.split(".")
        if parts[0] == "sparse_encoder":
            enc_state[k] = arr  # handled by the STUNet adapter below
        elif parts[0] == "densify_norms":
            # densify_norm='bn' checkpoints carry running stats too — drop
            # them (training-mode norms here), else running_mean/var would
            # land on (and overwrite) the bias leaf
            i, pname = parts[1], parts[2]
            if pname in ("weight", "bias"):
                put([f"densify_norm{i}",
                     "scale" if pname == "weight" else "bias"], arr)
        elif parts[0] == "densify_projs":
            i, pname = parts[1], parts[2]
            if pname == "weight":
                put([f"densify_proj{i}", "conv", "kernel"], arr.transpose(2, 3, 4, 1, 0))
            else:
                put([f"densify_proj{i}", "conv", "bias"], arr)
        elif parts[0] == "mask_tokens":
            put([f"mask_token{parts[1]}"], arr.reshape(-1))
        elif parts[0] == "dense_decoder":
            if parts[1] == "proj":
                if parts[2] == "weight":
                    put(["dense_decoder", "proj", "kernel"], arr.transpose(2, 3, 4, 1, 0))
                else:
                    put(["dense_decoder", "proj", "bias"], arr)
            elif parts[1] == "dec":
                i, layer = parts[2], parts[3]
                base = ["dense_decoder", f"dec{i}"]
                if layer == "up_sample":
                    if parts[4] == "weight":
                        put(base + ["up_sample", "conv", "kernel"],
                            np.flip(arr.transpose(2, 3, 4, 0, 1), (0, 1, 2)).copy())
                    else:
                        put(base + ["up_sample", "conv", "bias"], arr)
                elif layer == "conv":
                    # Sequential indices: 0 conv, 1 norm, 2 relu6, 3 conv, 4 norm
                    idx, pname = int(parts[4]), parts[5]
                    if pname in ("running_mean", "running_var", "num_batches_tracked"):
                        continue
                    if idx in (0, 3):
                        put(base + [f"conv{idx // 3}", "kernel"], arr.transpose(2, 3, 4, 1, 0))
                    elif idx in (1, 4):
                        put(base + [f"norm{idx // 3}",
                                    "scale" if pname == "weight" else "bias"], arr)
    if enc_state:
        tree["sparse_encoder"] = convert_torch_stunet_state_dict(enc_state)
    return tree


def _np(val) -> np.ndarray:
    arr = getattr(val, "detach", lambda: val)()
    return np.asarray(getattr(arr, "numpy", lambda: arr)())


def _strip_wrappers(key: str) -> str:
    """Drop DDP 'module.' prefixes and torch.compile '_orig_mod.' prefixes."""
    for pre in ("module.", "_orig_mod."):
        while key.startswith(pre):
            key = key[len(pre):]
    return key


def convert_torch_plain_unet_state_dict(state_dict: dict) -> dict:
    """Convert a torch PlainConvUNet state_dict (dynamic_network_architectures
    key scheme: encoder.stages.{s}.convs.{i}.conv/.norm, decoder.stages.{d},
    decoder.transpconvs.{d}, decoder.seg_layers.{d}; ConvDropoutNormReLU also
    registers its ops under .all_modules.{0,2} — both spellings accepted) into
    the flax param tree of models.plain_unet.PlainConvUNet."""
    tree: dict = {}

    def put(path, arr):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr

    def conv_block_param(base, layer, pname, arr):
        # our ConvNormAct: conv{i}/conv(ConvND)/conv(inner)/kernel|bias, norm/scale|bias
        if layer == "conv":
            put(base + ["conv", "conv", "kernel" if pname == "weight" else "bias"],
                arr.transpose(2, 3, 4, 1, 0) if pname == "weight" else arr)
        elif layer == "norm":
            put(base + ["norm", "scale" if pname == "weight" else "bias"], arr)

    for key, val in state_dict.items():
        k = _strip_wrappers(key)
        arr = _np(val)
        parts = k.split(".")
        try:
            if parts[0] == "encoder" and parts[1] == "stages":
                s, rest = parts[2], parts[3:]
                if rest[0] == "convs":
                    i, layer, pname = rest[1], rest[2], rest[3]
                    if layer == "all_modules":
                        layer = {"0": "conv", "2": "norm"}.get(rest[3])
                        pname = rest[4]
                    conv_block_param([f"encoder_stage_{s}", f"conv{i}"], layer, pname, arr)
            elif parts[0] == "decoder":
                if parts[1] == "stages":
                    d, rest = parts[2], parts[3:]
                    if rest[0] == "convs":
                        i, layer, pname = rest[1], rest[2], rest[3]
                        if layer == "all_modules":
                            layer = {"0": "conv", "2": "norm"}.get(rest[3])
                            pname = rest[4]
                        conv_block_param([f"decoder_stage_{d}", f"conv{i}"], layer, pname, arr)
                elif parts[1] == "transpconvs":
                    d, pname = parts[2], parts[-1]
                    if pname == "weight":
                        # torch ConvTranspose3d (I, O, kd, kh, kw) -> flax (kd, kh, kw, I, O)
                        put([f"decoder_transp_{d}", "kernel"], arr.transpose(2, 3, 4, 0, 1))
                    else:
                        put([f"decoder_transp_{d}", "bias"], arr)
                elif parts[1] == "seg_layers":
                    d, pname = parts[2], parts[-1]
                    if pname == "weight":
                        put([f"seg_output_{d}", "conv", "kernel"],
                            arr.transpose(2, 3, 4, 1, 0))
                    else:
                        put([f"seg_output_{d}", "conv", "bias"], arr)
        except IndexError:
            continue  # unknown key shape: skip (non-strict adapter)
    return tree


def convert_torch_resenc_state_dict(state_dict: dict) -> dict:
    """Convert a torch ResidualEncoderUNet state_dict
    (encoder.stages.{s}.blocks.{b}.conv1/.norm1/.conv2/.norm2 + skip conv;
    decoder as in PlainConvUNet) into models.plain_unet.ResidualEncoderUNet
    params (encoder_stage_{s}_block_{b}/conv1|norm1|conv2|norm2|conv3)."""
    tree = convert_torch_plain_unet_state_dict(
        {k: v for k, v in state_dict.items() if not k.startswith("encoder.")})

    def put(path, arr):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr

    for key, val in state_dict.items():
        k = _strip_wrappers(key)
        if not k.startswith("encoder.stages."):
            continue
        arr = _np(val)
        parts = k.split(".")
        try:
            s = parts[2]
            rest = parts[3:]
            if rest[0] == "blocks":
                b, layer = rest[1], rest[2]
                base = [f"encoder_stage_{s}_block_{b}"]
                pname = rest[-1]
                if layer in ("conv1", "conv2"):
                    # BasicBlockD conv1 is a ConvDropoutNormReLU (conv + norm)
                    sub = rest[3] if len(rest) > 4 else "conv"
                    if sub in ("conv", "all_modules") or len(rest) == 4:
                        if len(rest) == 4:  # plain conv module: conv1.weight
                            tgt_layer = layer
                            if pname == "weight":
                                put(base + [tgt_layer, "conv", "kernel"],
                                    arr.transpose(2, 3, 4, 1, 0))
                            else:
                                put(base + [tgt_layer, "conv", "bias"], arr)
                        elif sub == "conv" or (sub == "all_modules" and rest[4] == "0"):
                            if pname == "weight":
                                put(base + [layer, "conv", "kernel"],
                                    arr.transpose(2, 3, 4, 1, 0))
                            else:
                                put(base + [layer, "conv", "bias"], arr)
                        elif sub == "all_modules" and rest[4] == "2":
                            put(base + [f"norm{layer[-1]}",
                                        "scale" if pname == "weight" else "bias"], arr)
                    elif sub == "norm":
                        put(base + [f"norm{layer[-1]}",
                                    "scale" if pname == "weight" else "bias"], arr)
                elif layer in ("norm1", "norm2"):
                    put(base + [layer, "scale" if pname == "weight" else "bias"], arr)
                elif layer in ("skip", "downsample_skip", "conv3"):
                    if pname == "weight" and arr.ndim == 5:
                        put(base + ["conv3", "conv", "kernel"], arr.transpose(2, 3, 4, 1, 0))
                    elif pname == "bias":
                        put(base + ["conv3", "conv", "bias"], arr)
        except IndexError:
            continue
    return tree


_LOADER_SKIP = {
    # reference load_pretrained_weights.py skip lists per variant (:21, :255, :325)
    "default": (".seg_layers.", "seg_output", "seg_outputs"),
    "swin": ("out.conv.conv.weight", "out.conv.conv.bias"),
    "unimiss": ("cls_conv.weight", "cls_conv.bias"),
    "ssl": (),
    "moco": (),
}


def load_torch_pretrained_weights(params: dict, state_or_path, variant: str = "default",
                                  arch: str = "stunet", verbose: bool = False,
                                  allow_pickle: bool = False) -> dict:
    """Reference load_pretrained_weights family (load_pretrained_weights.py:
    :6 default name+shape merge skipping seg heads; :66 ssl — keys rewritten by
    split('sp_cnn.')[-1], encoder blocks only; :109 moco — 'conv_blocks_context'
    keys rewritten by split('net')[1][3:]; :250 swin / :310 unimiss — default
    merge with their own skip lists).

    params: flax param tree of the target network. state_or_path: torch
    state_dict or .pt/.pth path. arch selects the torch->flax adapter
    ('stunet' | 'plain_unet' | 'resenc')."""
    if isinstance(state_or_path, (str, os.PathLike)):
        state = load_torch_checkpoint_file(str(state_or_path), allow_pickle=allow_pickle)
    else:
        state = state_or_path

    if variant == "ssl":
        state = {k.split("sp_cnn.")[-1]: v for k, v in state.items() if "encoder" in k}
    elif variant == "moco":
        state = {k.split("net")[1][3:]: v for k, v in state.items()
                 if "conv_blocks_context" in k and "net" in k}

    adapter = {
        "stunet": convert_torch_stunet_state_dict,
        "plain_unet": convert_torch_plain_unet_state_dict,
        "resenc": convert_torch_resenc_state_dict,
    }[arch]
    pre = adapter(state)

    skip = _LOADER_SKIP.get(variant, _LOADER_SKIP["default"])
    flat = flatten_tree(params)
    flat_pre = flatten_tree(pre)
    loaded = []
    for k, v in flat_pre.items():
        if any(s.strip(".") in k for s in skip):
            continue
        if k in flat and flat[k].shape == v.shape:
            flat[k] = np.asarray(v)
            loaded.append(k)
    if verbose:
        print(f"[{variant}/{arch}] transferred {len(loaded)}/{len(flat_pre)} tensors")
    if not loaded:
        raise RuntimeError(
            f"no tensors transferred (variant={variant}, arch={arch}); the "
            f"pretrained weights do not seem compatible with this network")
    return unflatten_tree(flat)


def load_torch_checkpoint_file(path: str, allow_pickle: bool = False) -> dict:
    """Load a torch .pth/.pt checkpoint (CPU) and return its network weights
    dict. Tries weights_only=True first (no arbitrary pickle execution from
    externally produced files); legacy pickled checkpoints require an explicit
    allow_pickle=True opt-in."""
    import torch
    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_pickle:
            raise RuntimeError(
                f"{path} is not loadable with weights_only=True; pass "
                f"allow_pickle=True to opt into full (unsafe) unpickling: {e}")
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("network_weights", "state_dict", "model"):
            if key in ckpt:
                return ckpt[key]
    return ckpt


def expand_input_channel_kernels(params: dict, target_in_channels: int) -> dict:
    """Duplicate first-conv input-channel kernels to fit a model with more
    input channels (reference load_stunet_for_autopet :212-249:
    weight.repeat(1, 2, 1, 1, 1) for CT->CT+PET transfer). Applies to every
    kernel whose input-channel dim is a divisor of target_in_channels and
    smaller than it, restricted to the stem convs (conv_blocks_context_0)."""
    flat = flatten_tree(params)
    for k, v in flat.items():
        if "conv_blocks_context_0" in k and k.endswith("kernel") and v.ndim == 5:
            cin = v.shape[3]
            if cin < target_in_channels and target_in_channels % cin == 0:
                reps = target_in_channels // cin
                flat[k] = np.tile(v, (1, 1, 1, reps, 1))
    return unflatten_tree(flat)
