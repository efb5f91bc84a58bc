"""Reference (PyTorch) checkpoint -> sparse_caption_tpu pytree converter.

Converts ``state_dict`` checkpoints from jiahuei/sparse-image-captioning
(published at the sparse-captioning-checkpoints repo, reference
``README.md:67-69``) into this framework's ``{"params", "masks"}`` pytrees.

Name mapping (verified against live reference modules):
* ORT: ``model.encoder.layers.i.self_attn.linears.{0..3}`` ->
  ``box_encoder_layers_i/self_attn/{q,k,v,out}_proj`` (weights transposed
  to (in, out)); ``WGs.h`` (h x Linear(64,1)) -> columns of ``wg`` (64, H);
  ``sublayer.j.norm.{a_2,b_2}`` -> ``subj/norm/{scale,bias}``;
  ``model.tgt_embed.0.lut.weight`` -> ``tgt_embed/lut/embedding``;
  ``att_embed.0`` -> ``att_embed``; ``model.generator.proj`` ->
  ``generator/proj``
* Transformer: same with ``core.`` prefix, ``core.src_embed.0`` -> ``src_proj``
* Up-Down: ``core.{att,lang}_lstm.weight_{ih,hh}`` -> ``{att,lang}_lstm/{ih,hh}``
  (torch gate order i,f,g,o preserved); ``core.attention.*`` -> ``attention/*``
* ``<name>_pruning_mask`` tensors -> the ``masks`` collection at the owning
  layer's ``mask`` leaf (same transforms as the weight they mask)

Weights with ``share_att``/``share_layer`` collapse to the deduplicated
layout automatically (aliased reference tensors are identical; last write
wins).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np
from flax import traverse_util

_ATTN_LINEARS = {"0": "q_proj", "1": "k_proj", "2": "v_proj", "3": "out_proj"}
_ATTN_LINEARS_SHARED_KV = {"0": "q_proj", "1": "kv_proj", "2": "out_proj"}
_ATTN_LINEARS_SHARED_QK = {"0": "q_proj", "1": "v_proj", "2": "out_proj"}


def _attn_map(share_att) -> Dict[str, str]:
    if share_att == "kv":
        return _ATTN_LINEARS_SHARED_KV
    if share_att == "qk":
        return _ATTN_LINEARS_SHARED_QK
    return _ATTN_LINEARS


def _convert_name(name: str, model_type: str, share_att_encoder=None, share_att_decoder=None):
    """torch param name -> (flax path tuple, needs_transpose, wg_head | None)."""
    is_mask = name.endswith("_pruning_mask")
    if is_mask:
        name = name[: -len("_pruning_mask")]

    if model_type == "up_down_lstm":
        m = {
            "embed.0.weight": ("embed/embedding", False),
            "fc_embed.0.weight": ("fc_embed/kernel", True),
            "fc_embed.0.bias": ("fc_embed/bias", False),
            "att_embed.0.weight": ("att_embed/kernel", True),
            "att_embed.0.bias": ("att_embed/bias", False),
            "logit.weight": ("logit_0/kernel", True),
            "logit.bias": ("logit_0/bias", False),
            "ctx2att.weight": ("ctx2att/kernel", True),
            "ctx2att.bias": ("ctx2att/bias", False),
            "core.att_lstm.weight_ih": ("att_lstm/ih/kernel", True),
            "core.att_lstm.weight_hh": ("att_lstm/hh/kernel", True),
            "core.att_lstm.bias_ih": ("att_lstm/ih/bias", False),
            "core.att_lstm.bias_hh": ("att_lstm/hh/bias", False),
            "core.lang_lstm.weight_ih": ("lang_lstm/ih/kernel", True),
            "core.lang_lstm.weight_hh": ("lang_lstm/hh/kernel", True),
            "core.lang_lstm.bias_ih": ("lang_lstm/ih/bias", False),
            "core.lang_lstm.bias_hh": ("lang_lstm/hh/bias", False),
            "core.attention.h2att.weight": ("attention/h2att/kernel", True),
            "core.attention.h2att.bias": ("attention/h2att/bias", False),
            "core.attention.alpha_net.weight": ("attention/alpha_net/kernel", True),
            "core.attention.alpha_net.bias": ("attention/alpha_net/bias", False),
        }
        if name in m:
            path, tr = m[name]
            return tuple(path.split("/")), tr, None, is_mask
        return None

    # transformer family: prefix core.(transformer) / model.(ORT)
    prefix = "core." if model_type == "transformer" else "model."
    is_ort = model_type == "relation_transformer"

    if name == "att_embed.0.weight":
        return ("att_embed", "kernel"), True, None, is_mask
    if name == "att_embed.0.bias":
        return ("att_embed", "bias"), False, None, is_mask
    if name == prefix + "src_embed.0.weight":
        return ("src_proj", "kernel"), True, None, is_mask
    if name == prefix + "src_embed.0.bias":
        return ("src_proj", "bias"), False, None, is_mask
    if name == prefix + "tgt_embed.0.lut.weight":
        return ("tgt_embed", "lut", "embedding"), False, None, is_mask
    if name == prefix + "generator.proj.weight":
        return ("generator", "proj", "kernel"), True, None, is_mask
    if name == prefix + "generator.proj.bias":
        return ("generator", "proj", "bias"), False, None, is_mask
    if name.endswith(".pe"):
        return None  # positional table is recomputed

    m = re.match(
        rf"{re.escape(prefix)}(encoder|decoder)\.(?:norm\.(a_2|b_2)|layers\.(\d+)\.(.+))", name
    )
    if not m:
        return None
    side, top_norm, layer_idx, rest = m.groups()
    enc_prefix = "box_encoder_layers" if (side == "encoder" and is_ort) else (
        "encoder_layers" if side == "encoder" else "decoder_layers"
    )
    norm_name = ("box_encoder_norm" if is_ort else "encoder_norm") if side == "encoder" else "decoder_norm"
    if top_norm:
        leaf = "scale" if top_norm == "a_2" else "bias"
        return (norm_name, leaf), False, None, is_mask
    layer = f"{enc_prefix}_{layer_idx}"

    share = share_att_encoder if side == "encoder" else share_att_decoder
    amap = _attn_map(share)

    m2 = re.match(r"(self_attn|src_attn)\.linears\.(\d+)\.(weight|bias)", rest)
    if m2:
        attn, idx, kind = m2.groups()
        proj = amap[idx]
        leaf = "kernel" if kind == "weight" else "bias"
        return (layer, attn, proj, leaf), kind == "weight", None, is_mask
    m2 = re.match(r"self_attn\.WGs\.(\d+)\.(weight|bias)", rest)
    if m2:
        head, kind = m2.groups()
        leaf = "kernel" if kind == "weight" else "bias"
        return (layer, "self_attn", "wg", leaf), kind == "weight", int(head), is_mask
    m2 = re.match(r"feed_forward\.(w_1|w_2)\.(weight|bias)", rest)
    if m2:
        w, kind = m2.groups()
        leaf = "kernel" if kind == "weight" else "bias"
        return (layer, "feed_forward", w, leaf), kind == "weight", None, is_mask
    m2 = re.match(r"sublayer\.(\d+)\.norm\.(a_2|b_2)", rest)
    if m2:
        j, ab = m2.groups()
        leaf = "scale" if ab == "a_2" else "bias"
        return (layer, f"sub{j}", "norm", leaf), False, None, is_mask
    return None


def densify_torch_state_dict(state_dict: Dict) -> Dict:
    """Densify torch sparse-COO tensors (the reference's published sparse
    checkpoints, ``pruning/prune.py:200-221`` state_dict_sparse /
    ``model_utils.py:108-116`` densify_state_dict)."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "is_sparse") and v.is_sparse:
            v = v.to_dense()
        out[k] = v
    return out


def convert_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    model_type: str,
    num_heads: int = 8,
    share_att_encoder=None,
    share_att_decoder=None,
) -> Tuple[Dict, Dict]:
    """torch state_dict (tensors or ndarrays) -> (params, masks) pytrees.

    model_type: transformer | relation_transformer | up_down_lstm
    (``*_prune`` checkpoints: pass the base type; masks are detected by the
    ``_pruning_mask`` suffix).
    """
    flat_params: Dict[Tuple[str, ...], np.ndarray] = {}
    flat_masks: Dict[Tuple[str, ...], np.ndarray] = {}
    wg_w: Dict[Tuple[str, ...], Dict[int, np.ndarray]] = {}
    wg_b: Dict[Tuple[str, ...], Dict[int, np.ndarray]] = {}
    wg_wm: Dict[Tuple[str, ...], Dict[int, np.ndarray]] = {}
    skipped = []

    for name, tensor in state_dict.items():
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        conv = _convert_name(name, model_type, share_att_encoder, share_att_decoder)
        if conv is None:
            skipped.append(name)
            continue
        path, transpose, wg_head, is_mask = conv
        if transpose and arr.ndim == 2:
            arr = arr.T
        if wg_head is not None:
            store = wg_wm if is_mask else (wg_w if path[-1] == "kernel" else wg_b)
            store.setdefault(path, {})[wg_head] = arr
            continue
        if is_mask:
            # mask attaches at the owning layer: .../<layer>/mask
            flat_masks[path[:-1] + ("mask",)] = arr
        else:
            flat_params[path] = arr

    # assemble per-head WG columns -> (dim_g, H) kernels / (H,) biases
    for path, heads in wg_w.items():
        cols = [heads[h].reshape(-1, 1) for h in sorted(heads)]
        flat_params[path] = np.concatenate(cols, axis=1)
    for path, heads in wg_b.items():
        flat_params[path] = np.concatenate([heads[h].reshape(-1) for h in sorted(heads)])
    for path, heads in wg_wm.items():
        cols = [heads[h].reshape(-1, 1) for h in sorted(heads)]
        flat_masks[path[:-1] + ("mask",)] = np.concatenate(cols, axis=1)

    params = traverse_util.unflatten_dict(flat_params)
    masks = traverse_util.unflatten_dict(flat_masks)
    return params, masks
