"""Exact conv-MAC count for the AnatoMask pretraining step at the reference
workload (STUNet-B head, patch 112x112x128, bs 4, mask 0.6) — the basis for the
FLOP-derived A100 baseline in BASELINE.md. Pure arithmetic, no jax."""
import json
import numpy as np

PATCH = np.array([112, 112, 128])
BS = 4


def stage_voxels(level):
    return int(np.prod(PATCH // (2 ** level)))


def conv_mac(vox, cin, cout, k=27):
    return vox * cin * cout * k


def encoder_macs(dims=(32, 64, 128, 256, 512), cin0=1):
    """STUNet-B encoder head: stage d = BasicResBlock(conv1 k3 (strided for
    d>0), conv2 k3, conv3 1x1 shortcut)."""
    total = 0
    per_stage = []
    cin = cin0
    for d, c in enumerate(dims):
        vox = stage_voxels(d)  # output voxels of the (possibly strided) stage
        m = conv_mac(vox, cin, c) + conv_mac(vox, c, c) + conv_mac(vox, cin, c, 1)
        per_stage.append(m)
        total += m
        cin = c
    return total, per_stage


def decoder_macs(width=512, n=4, out_ch=1):
    """LightDecoder: n UNetBlocks (ConvT k4 s2 [8 taps/out-vox], conv0 k3 cin->cin,
    conv1 k3 cin->cout) with width halving, + 1x1 proj."""
    total = 0
    per = []
    c = width
    for i in range(n):
        vox = stage_voxels(n - 1 - i)  # output voxels after the 2x upsample
        cout = c // 2
        m = conv_mac(vox, c, c, 8) + conv_mac(vox, c, c) + conv_mac(vox, c, cout)
        per.append(m)
        total += m
        c = cout
    total += conv_mac(stage_voxels(0), c, out_ch, 1)
    return total, per


def densify_macs(dims=(32, 64, 128, 256, 512), width=512):
    """SparK densify projections: scale 0 (coarsest) identity when widths match,
    then 3x3x3 projections to width/2^i at each scale."""
    total = 0
    dcur = width
    for i, c in enumerate(reversed(dims)):
        vox = stage_voxels(len(dims) - 1 - i)
        if not (i == 0 and c == dcur):
            k = 1 if i == 0 else 27
            total += conv_mac(vox, c, dcur, k)
        dcur //= 2
    return total


enc, enc_per = encoder_macs()
dec, dec_per = decoder_macs()
den = densify_macs()
fwd = enc + dec + den
report = {
    "per_sample_fwd_GMAC": {
        "encoder": round(enc / 1e9, 1),
        "densify": round(den / 1e9, 1),
        "decoder": round(dec / 1e9, 1),
        "total": round(fwd / 1e9, 1),
    },
    "encoder_per_stage_GMAC": [round(m / 1e9, 1) for m in enc_per],
    "decoder_per_stage_GMAC": [round(m / 1e9, 1) for m in dec_per],
    # torch reference step: teacher fwd + student fwd + student bwd (2x fwd),
    # all DENSE (emulated sparsity), no remat, bs 4
    "torch_step_TFLOP_bs4": round(BS * (1 + 3) * fwd * 2 / 1e12, 2),
}
print(json.dumps(report, indent=1))
