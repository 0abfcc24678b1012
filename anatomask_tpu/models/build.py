"""Network construction from plans.

Capability parity: /root/reference/nnunetv2/utilities/get_network_from_plans.py:9
(PlainConvUNet from configuration topology) and the STUNetTrainer family's
build_network_architecture (/root/reference/nnunetv2/training/nnUNetTrainer/
STUNetTrainer.py:44-67,199-354): STUNet presets take pool/conv kernel sizes from
the plans configuration.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from anatomask_tpu.models.plain_unet import PlainConvUNet
from anatomask_tpu.models.stunet import STUNet, stunet_preset


def build_network_from_plans(
    plans_manager,
    configuration_manager,
    num_input_channels: int,
    num_output_channels: int,
    arch_name: Optional[str] = None,
    deep_supervision: bool = True,
    dtype=jnp.float32,
    norm: str = "instance",
    remat: bool = False,
):
    """arch_name overrides the plans' UNet_class_name; 'STUNet-{S,B,L,H}' selects
    the STUNet family with topology from the plans."""
    cm = configuration_manager
    name = arch_name or cm.UNet_class_name
    strides = [list(s) for s in cm.pool_op_kernel_sizes]
    kernels = [list(k) for k in cm.conv_kernel_sizes]
    n_stages = len(kernels)

    if name.lower().startswith("stunet"):
        preset = {"s": "small", "b": "base", "l": "large", "h": "huge"}[
            name.split("-")[-1].lower()[0]
        ]
        # STUNet takes num_pool strides (without the leading unit stride)
        pool_sizes = strides[1:] if all(s == 1 for s in strides[0]) else strides
        # STUNet is fixed at 6 stages; extend/truncate plans topology to match
        while len(pool_sizes) < 5:
            pool_sizes.append([1] * len(kernels[0]))
        pool_sizes = pool_sizes[:5]
        while len(kernels) < 6:
            kernels.append([3] * len(kernels[0]))
        kernels = kernels[:6]
        return stunet_preset(
            preset, num_input_channels, num_output_channels,
            pool_op_kernel_sizes=pool_sizes, conv_kernel_sizes=kernels,
            deep_supervision=deep_supervision, dtype=dtype,
            remat=remat or None,
        )

    features = [
        min(cm.UNet_base_num_features * 2 ** i, cm.unet_max_num_features)
        for i in range(n_stages)
    ]
    if name == "ResidualEncoderUNet":
        from anatomask_tpu.models.plain_unet import ResidualEncoderUNet
        return ResidualEncoderUNet(
            input_channels=num_input_channels,
            num_classes=num_output_channels,
            n_stages=n_stages,
            features_per_stage=features,
            kernel_sizes=kernels,
            strides=strides,
            n_blocks_per_stage=list(cm.n_conv_per_stage_encoder),
            n_conv_per_stage_decoder=list(cm.n_conv_per_stage_decoder),
            deep_supervision=deep_supervision,
            dtype=dtype,
            remat=remat,
        )
    if name == "PlainConvUNet":
        return PlainConvUNet(
            input_channels=num_input_channels,
            num_classes=num_output_channels,
            n_stages=n_stages,
            features_per_stage=features,
            kernel_sizes=kernels,
            strides=strides,
            n_conv_per_stage=list(cm.n_conv_per_stage_encoder),
            n_conv_per_stage_decoder=list(cm.n_conv_per_stage_decoder),
            deep_supervision=deep_supervision,
            norm=norm,
            dtype=dtype,
            remat=remat,
        )
    raise RuntimeError(f"Unknown network architecture {name!r}")
