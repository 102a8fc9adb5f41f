"""Reference-checkpoint migration: torch state dicts -> this framework.

Converts checkpoints trained with the reference repo
(phbgomes22/FastFourierConvolution) into this framework's variables, so
existing models carry over:

  * :func:`convert_fgan_generator` — the flagship ``FGenerator``
    (reference fgan_complete.py:81-140: Linear stem, FFC_BN_ACT
    upsampling ladder with per-block noise injection, FFC to-RGB tail)
    -> :class:`models.FFCGenerator` variables;
  * :func:`convert_sn_discriminator` — the 7-conv spectral-norm
    ``Discriminator`` (fgan_complete.py:142-171)
    -> :class:`models.SNConvDiscriminator` variables;
  * :func:`load_reference_checkpoint` — unwraps the reference's
    ``{model_state_dict, optimizer_state_dict, ...}`` .pth container
    (reference models/ffcmodel.py:66-107).

Layout translations handled here (golden-tested against the reference
implementation in tests/test_checkpoint_migration.py):

  * conv OIHW -> HWIO; conv-transpose IOHW -> HWIO;
  * Linear (out, in) -> (in, out), with the stem's NCHW->NHWC reshape
    permutation folded into the kernel;
  * the FourierUnit's interleaved re/im channel order
    (torch ``stack(..., dim=-1).view``) -> this framework's
    concatenated [re; im] order (kernel rows/cols and BN vectors
    permuted);
  * BatchNorm weight/bias -> scale/bias params + running stats into the
    ``batch_stats`` collection;
  * spectral-norm ``weight_orig``/``weight_u`` -> kernel + ``spectral``
    u vector.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().float()
    return np.asarray(t.numpy() if hasattr(t, "numpy") else t, np.float32)


def load_reference_checkpoint(path_or_dict) -> Dict[str, np.ndarray]:
    """Load a reference .pth; unwrap the FFCModel checkpoint container
    when present (reference models/ffcmodel.py:66-107)."""
    sd = path_or_dict
    if isinstance(sd, (str, bytes)):
        import torch

        sd = torch.load(sd, map_location="cpu", weights_only=True)
    if "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    return sd


def _conv(sd, key):
    """torch Conv2d OIHW -> HWIO."""
    return jnp.asarray(np.transpose(_np(sd[key]), (2, 3, 1, 0)))


def _convt(sd, key):
    """torch ConvTranspose2d IOHW -> HWIO, spatially flipped (this
    framework's conv_transpose2d formulates torch's convT as an
    input-dilated forward conv, which reverses the kernel taps)."""
    w = _np(sd[key])[:, :, ::-1, ::-1]
    return jnp.asarray(np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))))


def _bn(sd, prefix, params_out: Dict, stats_out: Dict, perm=None):
    take = lambda name: (
        _np(sd[f"{prefix}.{name}"])[perm]
        if perm is not None
        else _np(sd[f"{prefix}.{name}"])
    )
    params_out["scale"] = jnp.asarray(take("weight"))
    params_out["bias"] = jnp.asarray(take("bias"))
    stats_out["mean"] = jnp.asarray(take("running_mean"))
    stats_out["var"] = jnp.asarray(take("running_var"))


def _interleave_perm(c: int) -> np.ndarray:
    """ours-concat index k (= c + p*C) -> torch-interleaved index 2c+p
    (reference fourier_unity.py:40-42 stacks re/im channel-interleaved;
    this framework concatenates [re; im])."""
    k = np.arange(2 * c)
    return 2 * (k % c) + (k // c)


def _spectral_transform(sd, prefix: str, params: Dict, stats: Dict) -> None:
    """reference SpectralTransform (conv1+bn1 -> FourierUnit -> conv2,
    SELayer; spectral_transform.py:34-110) -> this framework's
    convg2g param/stat subtrees. LFU weights are skipped: its use is
    commented out in the reference forward (:94-105)."""
    params["Conv2d_0"] = {"kernel": _conv(sd, f"{prefix}.conv1.weight")}
    params["Conv2d_1"] = {"kernel": _conv(sd, f"{prefix}.conv2.weight")}
    bn_p, bn_s = {}, {}
    _bn(sd, f"{prefix}.bn1", bn_p, bn_s)
    params["BatchNorm_0"] = {"BatchNorm_0": bn_p}
    stats["BatchNorm_0"] = {"BatchNorm_0": bn_s}

    # FourierUnit: interleaved -> concatenated channel order
    w = _np(sd[f"{prefix}.fu.conv_layer.weight"])[:, :, 0, 0]  # (2C, 2C)
    c = w.shape[0] // 2
    perm = _interleave_perm(c)
    params["FourierUnit_0"] = {
        "mix_kernel": jnp.asarray(w[np.ix_(perm, perm)].T),
    }
    fu_s: Dict = {}
    fu_bn_p: Dict = {}
    _bn(sd, f"{prefix}.fu.bn", fu_bn_p, fu_s, perm=perm)
    params["FourierUnit_0"]["bn_scale"] = fu_bn_p["scale"]
    params["FourierUnit_0"]["bn_bias"] = fu_bn_p["bias"]
    stats["FourierUnit_0"] = fu_s

    params["SELayer_0"] = {
        "Dense_0": {"kernel": jnp.asarray(_np(sd[f"{prefix}.se_block.fc.0.weight"]).T)},
        "Dense_1": {"kernel": jnp.asarray(_np(sd[f"{prefix}.se_block.fc.2.weight"]).T)},
    }


def _ffc_bn_act(sd, prefix: str, params: Dict, stats: Dict,
                transpose: bool, has_bn: bool) -> None:
    conv = _convt if transpose else _conv
    ffc_p: Dict = {}
    ffc_s: Dict = {}
    for branch in ("convl2l", "convl2g", "convg2l"):
        key = f"{prefix}.ffc.{branch}.weight"
        if key in sd:
            ffc_p[branch] = {"kernel": conv(sd, key)}
    if f"{prefix}.ffc.convg2g.conv1.weight" in sd:
        g2g_p: Dict = {}
        g2g_s: Dict = {}
        _spectral_transform(sd, f"{prefix}.ffc.convg2g", g2g_p, g2g_s)
        ffc_p["convg2g"] = g2g_p
        ffc_s["convg2g"] = g2g_s
    params["ffc"] = ffc_p
    if ffc_s:
        stats["ffc"] = ffc_s
    if has_bn:
        for side in ("bn_l", "bn_g"):
            if f"{prefix}.{side}.weight" in sd:
                p, s = {}, {}
                _bn(sd, f"{prefix}.{side}", p, s)
                params[side] = {"BatchNorm_0": p}
                stats[side] = {"BatchNorm_0": s}
            elif f"{prefix}.{side}.embed.weight" in sd:
                # class-conditional BN (reference layers/cond/cond_bn.py:
                # Embedding(num_classes, 2C) = [gamma; beta] chunks +
                # affine-free BatchNorm2d running stats) -> this
                # framework's ConditionalBatchNorm {gamma, beta} params
                # and BatchNorm_0 batch_stats
                emb = _np(sd[f"{prefix}.{side}.embed.weight"])
                c = emb.shape[1] // 2
                params[side] = {
                    "gamma": jnp.asarray(emb[:, :c]),
                    "beta": jnp.asarray(emb[:, c:]),
                }
                stats[side] = {"BatchNorm_0": {
                    "mean": jnp.asarray(
                        _np(sd[f"{prefix}.{side}.bn.running_mean"])
                    ),
                    "var": jnp.asarray(
                        _np(sd[f"{prefix}.{side}.bn.running_var"])
                    ),
                }}


def convert_fgan_generator(
    path_or_dict, mg: int = 4, num_blocks: Optional[int] = None
) -> Dict:
    """Reference ``FGenerator`` state dict -> ``FFCGenerator`` variables
    ({params, batch_stats}).

    The 32/64/128px script variants all follow the same naming scheme
    (fgan_complete.py:92-114, fgan64_complete.py:101-123,
    fgan128_complete.py:458-484): blocks conv2..conv{N} + a ratio->0
    tail conv{N+1}; ``num_blocks`` is auto-detected from the keys when
    not given. Mapping: conv{i+2} -> block{i}; the tail -> to_rgb;
    lcl/glb_noise{i+2} -> lcl/glb_noise{i}.
    """
    sd = load_reference_checkpoint(path_or_dict)
    params: Dict = {}
    stats: Dict = {}
    params["noise_to_feature"] = _dense_stem_nchw(
        sd, "noise_to_feature.0", mg
    )
    _convert_ffc_ladder(sd, params, stats, num_blocks)
    return {"params": params, "batch_stats": stats}


def _dense_stem_nchw(sd, prefix: str, mg: int) -> Dict:
    """Linear stem (out, in) -> (in, out) with the reshape permutation:
    torch reshapes the output vector to NCHW (C, mg, mg); ours to NHWC
    (mg, mg, C) — fold the (c,h,w)->(h,w,c) reorder into the kernel."""
    w = _np(sd[f"{prefix}.weight"])  # (out, in)
    b = _np(sd[f"{prefix}.bias"])
    out_dim = w.shape[0]
    ch = out_dim // (mg * mg)
    j = np.arange(out_dim)
    h, wpos, c = j // (mg * ch), (j // ch) % mg, j % ch
    torch_idx = c * mg * mg + h * mg + wpos
    return {
        "kernel": jnp.asarray(w[torch_idx, :].T),
        "bias": jnp.asarray(b[torch_idx]),
    }


def _convert_ffc_ladder(
    sd, params: Dict, stats: Dict, num_blocks: Optional[int] = None
) -> None:
    """conv2..conv{N+1} FFC up-blocks + the conv{N+2} to-RGB tail and
    their per-block noise injections — the body shared by every script
    FGenerator variant, conditional or not (reference
    fgan_complete.py:92-134, fgan_cond_complete.py:42-110)."""
    if num_blocks is None:
        idx = sorted(
            int(k.split(".")[0][4:])
            for k in sd
            if k.startswith("conv") and k.endswith(".ffc.convl2l.weight")
        )
        assert idx and idx[0] == 2, f"unrecognised FGenerator keys: {idx}"
        num_blocks = len(idx) - 1  # the last conv is the to-RGB tail

    for i in range(num_blocks):
        p: Dict = {}
        s: Dict = {}
        _ffc_bn_act(sd, f"conv{i + 2}", p, s, transpose=True, has_bn=True)
        params[f"block{i}"] = p
        if s:
            stats[f"block{i}"] = s
        for side in ("lcl", "glb"):
            key = f"{side}_noise{i + 2}.weight"
            if key in sd:
                params[f"{side}_noise{i}"] = {
                    "weight": jnp.asarray(
                        _np(sd[key]).reshape(1, 1, 1, -1)
                    )
                }

    p, s = {}, {}
    _ffc_bn_act(
        sd, f"conv{2 + num_blocks}", p, s, transpose=False, has_bn=False
    )
    params["to_rgb"] = p
    if s:
        stats["to_rgb"] = s


def convert_fcond_generator(
    path_or_dict, mg: int = 4, num_blocks: Optional[int] = None
) -> Dict:
    """Reference conditional ``FCondGenerator`` state dict ->
    :class:`models.FFCCondGenerator` variables ({params, batch_stats}).

    Handles both script stems (reference fgan_cond_complete.py):

      * ConvT stem (:63-93): ``label_embed`` -> ``label_conv``
        ConvT(4,1,0)+BN+GELU; z -> ``input_conv`` twin; channel concat —
        also the fgan128_cond_complete.py:75-105 layout;
      * dense stem (``FCondGeneratorSTL`` :117-186): concat(z, embed) ->
        ``noise_to_feature`` Linear.

    The FFC ladder (conv2..conv4 + conv5 tail, class-conditional BN)
    maps through the shared :func:`_convert_ffc_ladder`.
    """
    sd = load_reference_checkpoint(path_or_dict)
    params: Dict = {}
    stats: Dict = {}
    params["label_embed"] = jnp.asarray(_np(sd["label_embed.weight"]))
    if "input_conv.0.weight" in sd:
        for name in ("label_conv", "input_conv"):
            params[name] = {
                "kernel": _convt(sd, f"{name}.0.weight"),
                "bias": jnp.asarray(_np(sd[f"{name}.0.bias"])),
            }
        for ours, theirs in (
            ("label_bn", "label_conv.1"), ("input_bn", "input_conv.1")
        ):
            p, s = {}, {}
            _bn(sd, theirs, p, s)
            params[ours] = {"BatchNorm_0": p}
            stats[ours] = {"BatchNorm_0": s}
    elif "noise_to_feature.weight" in sd:
        params["noise_to_feature"] = _dense_stem_nchw(
            sd, "noise_to_feature", mg
        )
    else:
        raise ValueError(
            "unrecognised conditional-generator stem: expected "
            "input_conv.0.weight (ConvT stem) or noise_to_feature.weight "
            "(dense STL stem)"
        )
    _convert_ffc_ladder(sd, params, stats, num_blocks)
    return {"params": params, "batch_stats": stats}


def convert_cond_sn_discriminator(path_or_dict, mg: int = 4) -> Dict:
    """Reference conditional SN ``Discriminator``
    (fgan_cond_complete.py:189-227: 7 SN convs + SN fc + a label
    embedding reshaped to one extra image plane) ->
    :class:`models.CondSNDiscriminator` variables
    ({params, spectral})."""
    sd = load_reference_checkpoint(path_or_dict)
    out = convert_sn_discriminator(sd, mg=mg)
    out["params"]["label_embed"] = jnp.asarray(_np(sd["label_embed.weight"]))
    return out


def convert_sn_discriminator(path_or_dict, mg: int = 4) -> Dict:
    """Reference 7-conv SN ``Discriminator`` (fgan_complete.py:142-171)
    -> ``SNConvDiscriminator`` variables ({params, spectral}).

    torch spectral_norm stores ``weight_orig`` (the unnormalised kernel)
    and the power-iteration vector ``weight_u`` over the (out, in*k*k)
    matricisation — identical to this framework's u convention
    (ops/spectral_norm.py), so both carry over directly.
    """
    sd = load_reference_checkpoint(path_or_dict)
    params: Dict = {}
    spectral: Dict = {}
    # reference convs are an nn.Sequential: conv1..conv7 at indices with
    # names 'convN.weight_orig' etc.; the fc head is 'fc.weight'
    i = 0
    while f"conv{i + 1}.weight_orig" in sd or f"conv{i + 1}.weight" in sd:
        name = f"conv{i}"
        tkey = f"conv{i + 1}"
        if f"{tkey}.weight_orig" in sd:
            kernel = _np(sd[f"{tkey}.weight_orig"])
            u = _np(sd[f"{tkey}.weight_u"])
            spectral[name] = {"u": jnp.asarray(u)}
        else:
            kernel = _np(sd[f"{tkey}.weight"])
        entry = {"kernel": jnp.asarray(np.transpose(kernel, (2, 3, 1, 0)))}
        if f"{tkey}.bias" in sd:
            entry["bias"] = jnp.asarray(_np(sd[f"{tkey}.bias"]))
        params[name] = entry
        i += 1
    fc_key = "fc.weight_orig" if "fc.weight_orig" in sd else "fc.weight"
    if fc_key in sd:
        w = _np(sd[fc_key])  # (1, mg*mg*C), flattened NCHW (c-major)
        ch = w.shape[1] // (mg * mg)
        j = np.arange(w.shape[1])  # ours-NHWC flat index
        h, wpos, c = j // (mg * ch), (j // ch) % mg, j % ch
        torch_idx = c * mg * mg + h * mg + wpos
        params["fc"] = {
            "kernel": jnp.asarray(w[:, torch_idx].T),
            "bias": jnp.asarray(_np(sd["fc.bias"])),
        }
        if "fc.weight_u" in sd:
            spectral["fc"] = {"u": jnp.asarray(_np(sd["fc.weight_u"]))}
    return {"params": params, "spectral": spectral}
