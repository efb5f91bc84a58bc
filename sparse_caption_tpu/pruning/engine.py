"""Pruning algorithms over parameter/mask pytrees.

TPU-native rebuild of the reference ``PruningMixin``
(``sparse_caption/pruning/prune.py:46-476``).  The reference discovers masks
by the ``_pruning_mask`` name suffix and mutates ``Parameter``s in place;
here masks are the ``"masks"`` flax collection (leaf name ``mask``) and every
operation is a pure pytree -> pytree function.

Weight <-> mask pairing: a mask at path ``(.., layer, 'mask')`` masks the
unique weight param of that layer (``kernel`` for Dense, ``embedding`` for
Embed) — the structural twin of ``all_pruned_weights``
(``prune.py:73-78``).

Implemented methods (parity anchors):
* supermask sparsity loss: ``|target - sparsity(round(sigmoid(m)))|``
  scaled by weight and reversed-cosine anneal (``prune.py:228-269``)
* one-shot magnitude: class-uniform / class-blind / class-distribution
  criteria (``prune.py:296-373``)
* SNIP: normalized signed mask-gradient saliency, pruned bottom-k exactly
  as the reference does (``prune.py:313-319`` — note the reference uses the
  *signed* grad, not |grad|; we match it for parity)
* gradual magnitude: Zhu & Gupta ``s_t = sf + (si-sf)(1-p)^3`` schedule
  (``prune.py:375-433``)
* weight folding, binarized-mask export, sparse (COO npz) export
  (``prune.py:165-226``)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from sparse_caption_tpu.ops.ste import rounding_sigmoid
from sparse_caption_tpu.pruning import (
    LOTTERY_MAG_BLIND,
    LOTTERY_MAG_DIST,
    LOTTERY_MAG_UNIFORM,
    MAG_BLIND,
    MAG_DIST,
    MAG_GRAD_BLIND,
    MAG_GRAD_DIST,
    MAG_GRAD_UNIFORM,
    MAG_PRUNE_MASKS,
    MAG_UNIFORM,
    SNIP,
    SUPER_MASKS,
)

WEIGHT_LEAVES = ("kernel", "embedding")


# ---------------------------------------------------------------- structure
def flat_masks(masks: Dict) -> Dict[Tuple[str, ...], jnp.ndarray]:
    return traverse_util.flatten_dict(masks)


def path_str(path: Tuple[str, ...]) -> str:
    return "/".join(path)


def mask_weight_pairs(params: Dict, masks: Dict) -> List[Tuple[Tuple[str, ...], jnp.ndarray, jnp.ndarray]]:
    """[(mask_path, weight, mask)] for every mask leaf."""
    fp = traverse_util.flatten_dict(params)
    out = []
    for mpath, mask in sorted(flat_masks(masks).items()):
        parent = mpath[:-1]
        weight = None
        for leaf in WEIGHT_LEAVES:
            if parent + (leaf,) in fp:
                weight = fp[parent + (leaf,)]
                break
        if weight is None:
            raise KeyError(f"no weight leaf found for mask at {path_str(mpath)}")
        out.append((mpath, weight, mask))
    return out


def active_paths(masks: Dict, freeze_scope: Optional[Sequence[str]] = None) -> List[Tuple[str, ...]]:
    """Mask paths not excluded by freeze_scope prefixes (prune.py:87-103)."""
    scopes = [s for s in (freeze_scope or []) if s]
    paths = sorted(flat_masks(masks).keys())
    if not scopes:
        return paths
    return [p for p in paths if not any(path_str(p).startswith(s) for s in scopes)]


# ----------------------------------------------------------------- sparsity
def sampled_mask_values(masks: Dict, mask_type: str) -> Dict[Tuple[str, ...], jnp.ndarray]:
    fm = flat_masks(masks)
    if mask_type in SUPER_MASKS:
        return {k: rounding_sigmoid(v) for k, v in fm.items()}
    return dict(fm)


def mask_sparsity(masks: Dict, mask_type: str, freeze_scope: Optional[Sequence[str]] = None):
    """(total_sparsity, total_nnz, {path: sparsity}) over active masks."""
    sampled = sampled_mask_values(masks, mask_type)
    act = active_paths(masks, freeze_scope)
    nnz = {p: jnp.sum(sampled[p]) for p in act}
    sizes = {p: sampled[p].size for p in act}
    total_nnz = sum(nnz.values())
    total = sum(sizes.values())
    per_tensor = {path_str(p): 1.0 - nnz[p] / sizes[p] for p in act}
    return 1.0 - total_nnz / total, total_nnz, per_tensor


def weight_sparsity(params: Dict, masks: Dict):
    """Sparsity of the actual weight tensors (nonzero count)."""
    pairs = mask_weight_pairs(params, masks)
    nnz = sum(jnp.sum(w != 0) for _, w, _ in pairs)
    total = sum(w.size for _, w, _ in pairs)
    return 1.0 - nnz / total, nnz


def mask_avg(masks: Dict, freeze_scope: Optional[Sequence[str]] = None):
    fm = flat_masks(masks)
    act = active_paths(masks, freeze_scope)
    vec = jnp.concatenate([fm[p].reshape(-1) for p in act])
    return jnp.mean(vec)


# ------------------------------------------------------------ supermask loss
def compute_sparsity_loss(
    masks: Dict,
    sparsity_target: float,
    weight: float,
    current_step,
    max_step: int,
    freeze_scope: Optional[Sequence[str]] = None,
):
    """Differentiable (via round-STE) supermask sparsity control loss
    (prune.py:228-269). Returns (scaled_loss, aux dict)."""
    fm = flat_masks(masks)
    act = active_paths(masks, freeze_scope)
    if not act:
        return jnp.zeros(()), {}
    nnz = sum(jnp.sum(rounding_sigmoid(fm[p])) for p in act)
    total = sum(fm[p].size for p in act)
    sparsity = 1.0 - nnz / total
    loss = jnp.abs(sparsity_target - sparsity)
    frac = jnp.minimum(jnp.asarray(current_step, jnp.float32) / max_step, 1.0)
    anneal_rate = (1.0 + jnp.cos(frac * jnp.pi)) / 2.0
    scaled = loss * weight * (1.0 - anneal_rate)
    return scaled, {"sparsity_loss": loss, "anneal_rate": anneal_rate, "mask_sparsity": sparsity}


# ------------------------------------------------------------- one-shot prune
def _compute_mask(criterion: np.ndarray, sparsity_target: float) -> np.ndarray:
    """Ones with the bottom-k by criterion zeroed (prune.py:271-283)."""
    assert 0.0 <= sparsity_target < 1.0
    flat = np.asarray(criterion).reshape(-1)
    mask = np.ones_like(flat, dtype=np.float32)
    k = int(sparsity_target * flat.size)
    if k > 0:
        idx = np.argsort(flat, kind="stable")[:k]
        mask[idx] = 0.0
    return mask


def update_masks_once(
    params: Dict,
    masks: Dict,
    mask_type: str,
    sparsity_target: float,
    freeze_scope: Optional[Sequence[str]] = None,
    snip_saliency: Optional[Dict] = None,
) -> Dict:
    """One-shot pruning -> new masks pytree (prune.py:296-373). Host-side
    (numpy): runs between steps, never in the jitted path."""
    assert mask_type in MAG_PRUNE_MASKS, f"invalid mask_type {mask_type}"
    act = set(active_paths(masks, freeze_scope))
    pairs = [(p, np.asarray(w), m) for p, w, m in mask_weight_pairs(params, masks) if p in act]
    paths = [p for p, _, _ in pairs]
    weights = [w for _, w, _ in pairs]

    if mask_type == SNIP:
        assert snip_saliency is not None, "SNIP requires accumulated mask gradients"
        fs = traverse_util.flatten_dict(snip_saliency)
        sal_vec = np.concatenate([np.asarray(fs[p]).reshape(-1) for p in paths])
        criteria = [sal_vec / sal_vec.sum()]
    elif mask_type in (MAG_DIST, MAG_GRAD_DIST, LOTTERY_MAG_DIST):
        crits = []
        for w in weights:
            std = np.std(w.reshape(-1))  # biased, reference uses unbiased=False
            crits.append(np.abs((w - w.mean()) / std))
        criteria = [np.concatenate([c.reshape(-1) for c in crits])]
    elif mask_type in (MAG_UNIFORM, MAG_GRAD_UNIFORM, LOTTERY_MAG_UNIFORM):
        criteria = [np.abs(w) for w in weights]
    elif mask_type in (MAG_BLIND, MAG_GRAD_BLIND, LOTTERY_MAG_BLIND):
        criteria = [np.concatenate([np.abs(w).reshape(-1) for w in weights])]
    else:
        raise ValueError(f"unknown mask_type {mask_type}")

    new_flat_masks = [_compute_mask(c, sparsity_target) for c in criteria]
    if len(new_flat_masks) == 1:
        sizes = [w.size for w in weights]
        splits = np.split(new_flat_masks[0], np.cumsum(sizes)[:-1])
        new_flat_masks = splits

    fm = dict(flat_masks(masks))
    for p, w, new_m in zip(paths, weights, new_flat_masks):
        fm[p] = jnp.asarray(new_m.reshape(w.shape))
    return traverse_util.unflatten_dict(fm)


def update_masks_once_device(
    params: Dict,
    masks: Dict,
    mask_type: str,
    sparsity_target,
    freeze_scope: Optional[Sequence[str]] = None,
) -> Dict:
    """Device-side (jit-compatible) magnitude mask update.

    TPU-native counterpart of :func:`update_masks_once` for the MAG_*
    families (not SNIP — saliency is accumulated on host anyway): the
    prune thresholds come from ``jnp.quantile`` on-device, so gradual
    pruning never round-trips the parameter set to the host. Through a
    tunneled TPU that round trip costs ~90 s per update at paper scale
    (300 MB params+masks + a 37M-element host argsort); on-device it is
    one sort. ``sparsity_target`` may be a traced scalar, so one compiled
    instance serves the whole Zhu&Gupta schedule.

    Semantics match the host path's bottom-k up to quantile-interpolation
    rounding (±1 element per pool, exact ties excepted) — well inside the
    reference's own NNZ ±5% acceptance (prune.py:296-373).
    """
    assert mask_type in MAG_PRUNE_MASKS and mask_type != SNIP, (
        f"device mask update supports magnitude families only, got {mask_type}")
    act = set(active_paths(masks, freeze_scope))
    pairs = [(p, w, m) for p, w, m in mask_weight_pairs(params, masks) if p in act]
    paths = [p for p, _, _ in pairs]
    weights = [w for _, w, _ in pairs]

    if mask_type in (MAG_UNIFORM, MAG_GRAD_UNIFORM, LOTTERY_MAG_UNIFORM):
        # per-tensor threshold
        new = []
        for w in weights:
            c = jnp.abs(w)
            th = jnp.quantile(c.reshape(-1), sparsity_target)
            new.append((c > th).astype(jnp.float32))
    else:
        if mask_type in (MAG_DIST, MAG_GRAD_DIST, LOTTERY_MAG_DIST):
            crits = [jnp.abs((w - w.mean()) / jnp.std(w)) for w in weights]
        else:  # blind families
            crits = [jnp.abs(w) for w in weights]
        th = jnp.quantile(jnp.concatenate([c.reshape(-1) for c in crits]), sparsity_target)
        new = [(c > th).astype(jnp.float32) for c in crits]

    fm = dict(flat_masks(masks))
    for p, m in zip(paths, new):
        fm[p] = m
    return traverse_util.unflatten_dict(fm)


# --------------------------------------------------------------- gradual
def gradual_sparsity_target(
    sparsity_target: float,
    current_step: int,
    start_step: int,
    prune_steps: int,
    initial_sparsity: float = 0.0,
    prune_frequency: int = 1000,
) -> Optional[float]:
    """Zhu & Gupta schedule (prune.py:375-433). Returns the sparsity to prune
    to if this step is a pruning step, else None."""
    t, t0, dt = current_step, start_step, prune_frequency
    tn = start_step + prune_frequency * prune_steps
    assert dt > 0 and prune_steps > 0
    in_range = t0 <= t <= tn
    if not (in_range and (t - t0) % dt == 0):
        return None
    p = min(1.0, max(0.0, (t - t0) / (tn - t0)))
    return sparsity_target + (initial_sparsity - sparsity_target) * ((1.0 - p) ** 3)


# ----------------------------------------------------------------- export
def binarize_masks(masks: Dict) -> Dict:
    """round(sigmoid(mask)) over every leaf (scripts/binarize_supermask.py:35-49)."""
    return jax.tree.map(lambda m: jnp.round(jax.nn.sigmoid(m)), masks)


def prune_weights(params: Dict, masks: Dict, mask_type: str) -> Dict:
    """Fold masks into weights: w <- w * sample(mask) (prune.py:165-174)."""
    fp = dict(traverse_util.flatten_dict(params))
    for mpath, weight, mask in mask_weight_pairs(params, masks):
        m = rounding_sigmoid(mask) if mask_type in SUPER_MASKS else mask
        parent = mpath[:-1]
        for leaf in WEIGHT_LEAVES:
            if parent + (leaf,) in fp:
                fp[parent + (leaf,)] = fp[parent + (leaf,)] * m
                break
    return traverse_util.unflatten_dict(fp)


def sparse_export(params: Dict, masks: Dict, mask_type: str) -> Dict[str, np.ndarray]:
    """COO export of pruned weights + dense everything else -> npz-able dict
    (equivalent capability to torch sparse state_dict, prune.py:195-221)."""
    pruned = prune_weights(params, masks, mask_type)
    fp = traverse_util.flatten_dict(pruned)
    pruned_paths = {p[:-1] for p, _, _ in mask_weight_pairs(params, masks)}
    out: Dict[str, np.ndarray] = {}
    for path, value in fp.items():
        key = path_str(path)
        arr = np.asarray(value)
        if path[:-1] in pruned_paths and path[-1] in WEIGHT_LEAVES:
            idx = np.nonzero(arr)
            out[f"{key}__sparse_indices"] = np.stack(idx, 1).astype(np.int32)
            out[f"{key}__sparse_values"] = arr[idx]
            out[f"{key}__sparse_shape"] = np.asarray(arr.shape, dtype=np.int64)
        else:
            out[key] = arr
    return out


def sparse_import(data: Dict[str, np.ndarray]) -> Dict:
    """Densify a sparse_export dict back into a params pytree
    (reference load_sparse_state_dict, prune.py:223-226)."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    keys = set(data.keys())
    for key in sorted(keys):
        if key.endswith("__sparse_indices"):
            base = key[: -len("__sparse_indices")]
            idx = data[key]
            vals = data[base + "__sparse_values"]
            shape = tuple(data[base + "__sparse_shape"])
            dense = np.zeros(shape, dtype=vals.dtype)
            dense[tuple(idx[:, i] for i in range(idx.shape[1]))] = vals
            flat[tuple(base.split("/"))] = dense
        elif key.endswith("__sparse_values") or key.endswith("__sparse_shape"):
            continue
        else:
            flat[tuple(key.split("/"))] = data[key]
    return traverse_util.unflatten_dict({k: jnp.asarray(v) for k, v in flat.items()})
