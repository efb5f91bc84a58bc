"""Device-resident CIDEr-D reward for SCST.

TPU-native replacement for the host reward pass of SCST training
(reference ``sparse_caption/scst/scorers.py:17-114`` +
``scst/cider/pyciderevalcap/ciderD/ciderD_scorer.py:57-226``): the
sampled captions' CIDEr-D scores are computed *inside* the jitted train
step, so an SCST step needs NO device->host transfer at all — on
tunneled/relayed TPU backends that removes a ~33 ms synced fetch plus the
host scoring time from every step, and on any backend it removes the
host from the training loop entirely (SCST becomes async-dispatchable,
like an XE step).

The math is the exact CIDEr-D of ``metrics/cider.py`` (itself verified
identical to both reference vendored scorers), restructured for the MXU/
VPU instead of Python dicts:

* n-grams are packed into 64-bit keys (two uint32 lanes, 16 bits per
  token id) — static shape ``4*T`` gram slots per caption;
* term frequencies / first-occurrence dedup come from an all-pairs key
  equality matrix (G x G, G = 4*T <= 128: trivial on the VPU);
* the corpus document-frequency pickle becomes an open-addressed device
  hash table (linear probing, probe depth fixed at build time) so the
  candidate's tf-idf norm sees the true train-corpus idf of every gram;
* the references' tf-idf vectors, norms and lengths are precomputed on
  host once per batch (``build_ref_pack`` — gts are fixed data) and the
  clipped cross term ``sum_g min(h_c, h_r) h_r idf^2`` is an all-pairs
  (G x L) match against them.

Exactness: identical gram accounting to the host scorer (first-eos
truncation, pad/bos skipping, the reference's "length counts bigrams"
quirk, gaussian length penalty, per-n norm clipping) — only f32 vs f64
rounding differs.  OOV reference words get per-image private ids above
the vocab so they can never collide with a sampled token, mirroring
string inequality on host.

BLEU-1..4 is computed on device too (the published SCST configs use
``--scst_bleu_weight 0,0,0,1``, ``resources/commands_pruning.sh:69``):
clipped matches against per-gram max reference counts (reused from the
same match matrix), "closest" effective reference length, tiny/small
smoothing and the per-image brevity penalty of ``metrics/bleu.py``.

Scope: word-level and radix tokenization.  For radix (ACORT), sampled
digit ids are regrouped into the word ids their host decode would
produce — entirely in-jit (``make_radix_to_word_fn``) — and then scored
by the same word-level machinery; character/bpe captions still score on
decoded word strings, which stays on host.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

N_GRAMS = 4
SIGMA = 6.0
_EMPTY = 0  # (hi, lo) == (0, 0) marks an empty hash slot / gram pad


# --------------------------------------------------------------------- keys
def _mix(hi, lo):
    """uint32 hash of a packed gram key; identical in numpy and jnp
    (both wrap uint32 arithmetic mod 2^32)."""
    h = hi * np.uint32(2654435761) ^ (lo * np.uint32(0x9E3779B9))
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    return h


def _pack(ids: Sequence[int]) -> Tuple[int, int]:
    """Pack <=4 token ids (each +1, 16 bits, first token most significant)
    into a (hi, lo) uint32 pair. Grams of different lengths can never
    collide: the packed value ranges are disjoint."""
    k = 0
    for i in ids:
        assert 0 <= i < 0xFFFF - 1, f"token id {i} exceeds 16-bit packing"
        k = (k << 16) | (i + 1)
    return (k >> 32) & 0xFFFFFFFF, k & 0xFFFFFFFF


# ----------------------------------------------------------------- df table
class DfTable:
    """Open-addressed uint32 hash table of the train-corpus document
    frequencies (the reference's ``coco-train-words.p`` contract,
    ``prepro_ngrams.py:115-133``), holding ``log(max(1, df))`` per gram.

    Only grams whose words are all in-vocab are stored: a sampled caption
    can only ever produce in-vocab grams, and reference-side tf-idf is
    precomputed on host from the string df.
    """

    def __init__(self, hi: np.ndarray, lo: np.ndarray, val: np.ndarray,
                 probe: int, ref_len: float):
        self.hi, self.lo, self.val = hi, lo, val
        self.probe = int(probe)
        self.ref_len = float(ref_len)
        self.size = int(hi.shape[0])

    @classmethod
    def build(cls, df: Dict[Tuple[str, ...], float], ref_len: float,
              token_to_id: Dict[str, int]) -> "DfTable":
        keys: List[Tuple[int, int]] = []
        vals: List[float] = []
        for gram, dfv in df.items():
            ids = [token_to_id.get(w) for w in gram]
            if any(i is None for i in ids):
                continue  # OOV gram: unreachable from sampled ids
            keys.append(_pack(ids))
            vals.append(math.log(max(1.0, float(dfv))))
        n = max(1, len(keys))
        size = 1
        while size < 4 * n:  # load factor <= 0.25 keeps probe chains short
            size *= 2
        hi = np.zeros(size, np.uint32)
        lo = np.zeros(size, np.uint32)
        val = np.zeros(size, np.float32)
        mask = size - 1
        # hash all keys at once: array uint32 ops wrap silently (numpy
        # SCALAR uint ops can raise overflow warnings)
        k_hi = np.asarray([k[0] for k in keys], np.uint32)
        k_lo = np.asarray([k[1] for k in keys], np.uint32)
        idx0 = _mix(k_hi, k_lo) & np.uint32(mask) if keys else np.zeros(0, np.uint32)
        max_probe = 0
        for i in range(len(keys)):
            idx = int(idx0[i])
            d = 0
            while hi[idx] or lo[idx]:
                idx = (idx + 1) & mask
                d += 1
            hi[idx], lo[idx], val[idx] = k_hi[i], k_lo[i], vals[i]
            max_probe = max(max_probe, d)
        return cls(hi, lo, val, probe=max_probe + 1, ref_len=float(ref_len))

    @classmethod
    def from_pickle(cls, path: str, token_to_id: Dict[str, int]) -> "DfTable":
        from sparse_caption_tpu.metrics.cider import CiderScorer
        from sparse_caption_tpu.scst.scorers import df_pickle_path

        scorer = CiderScorer.from_pickle(df_pickle_path(path))
        return cls.build(scorer.df, scorer.ref_len, token_to_id)

    def device_arrays(self):
        import jax.numpy as jnp

        return {"hi": jnp.asarray(self.hi), "lo": jnp.asarray(self.lo),
                "val": jnp.asarray(self.val)}


# ----------------------------------------------------------------- ref pack
def _precook_words(words: List[str]) -> Dict[Tuple[str, ...], int]:
    counts: Dict[Tuple[str, ...], int] = {}
    for n in range(1, N_GRAMS + 1):
        for i in range(len(words) - n + 1):
            g = tuple(words[i:i + n])
            counts[g] = counts.get(g, 0) + 1
    return counts


def build_ref_pack(gts: List[List[str]], df: Dict, ref_len: float,
                   token_to_id: Dict[str, int], vocab_size: int,
                   max_refs: int = None, max_grams: int = None):
    """Precompute per-reference tf-idf vectors for a batch of images.

    ``gts[i]``: ground-truth caption strings of image i (the engine's
    ``batch["gts"]``).  Returns numpy arrays shaped (B, R, L):
    key hi/lo, tf-idf value, gram order n, plus per-ref norms (B, R, 4),
    lengths (B, R) and ref validity (B, R) / counts (B,).

    Values use the STRING df (exactly the host scorer); ids are only the
    device matching representation.  OOV words get per-image ids starting
    at ``vocab_size`` so distinct OOV words stay distinct and never match
    a sampled (in-vocab) token.
    """
    b = len(gts)
    r_max = max_refs or max(len(r) for r in gts)
    cooked = [[_precook_words(s.split()) for s in refs] for refs in gts]
    l_max = max_grams or max((len(c) for refs in cooked for c in refs), default=1)
    l_max = max(1, l_max)
    hi = np.zeros((b, r_max, l_max), np.uint32)
    lo = np.zeros((b, r_max, l_max), np.uint32)
    val = np.zeros((b, r_max, l_max), np.float32)
    cnt = np.zeros((b, r_max, l_max), np.float32)  # raw tf (BLEU clipping)
    norms = np.zeros((b, r_max, N_GRAMS), np.float32)
    lens = np.zeros((b, r_max), np.float32)
    wlens = np.zeros((b, r_max), np.int32)  # word counts (BLEU closest reflen)
    ref_valid = np.zeros((b, r_max), np.float32)
    n_refs = np.zeros((b,), np.float32)
    for i, refs in enumerate(cooked):
        assert len(refs) <= r_max, f"image {i}: {len(refs)} refs > max_refs {r_max}"
        n_refs[i] = len(refs)
        oov: Dict[str, int] = {}
        for r, counts in enumerate(refs):
            ref_valid[i, r] = 1.0
            assert len(counts) <= l_max, \
                f"image {i} ref {r}: {len(counts)} grams > max_grams {l_max}"
            norm = [0.0] * N_GRAMS
            length = 0
            wlen = 0
            for j, (gram, tf) in enumerate(counts.items()):
                ids = []
                for w in gram:
                    wid = token_to_id.get(w)
                    if wid is None:
                        wid = oov.setdefault(w, vocab_size + len(oov))
                    ids.append(wid)
                khi, klo = _pack(ids)
                dfv = math.log(max(1.0, float(df.get(gram, 0.0))))
                n = len(gram) - 1
                v = float(tf) * (ref_len - dfv)
                hi[i, r, j], lo[i, r, j], val[i, r, j] = khi, klo, v
                cnt[i, r, j] = float(tf)
                norm[n] += v * v
                if n == 0:
                    wlen += tf  # unigram tf total == word count
                if n == 1:
                    length += tf  # reference quirk: "length" counts bigrams
            norms[i, r] = [math.sqrt(x) for x in norm]
            lens[i, r] = length
            wlens[i, r] = wlen
    # no per-gram order array is needed on device: the disjoint per-order
    # key ranges (_pack) make cross-order collisions impossible
    return {"hi": hi, "lo": lo, "val": val, "cnt": cnt, "norms": norms,
            "lens": lens, "wlens": wlens, "ref_valid": ref_valid, "n_refs": n_refs}


def ref_pack_device(pack):
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in pack.items()}


# ---------------------------------------------------------- radix regroup
def make_radix_to_word_fn(radix_base: int, tokens_per_word: int,
                          word_vocab_size: int):
    """In-jit mirror of the radix tokenizer's decode-to-word-ids
    (``tokenizers/radix.py:109-138``, reference ``tokenizer.py:550-725``):
    truncate at the first radix ``<eos>``, drop pad/bos digits anywhere,
    group the surviving digits into words of ``tokens_per_word``
    (padding a short tail with digit 1 — the reference grouper's
    fillvalue), and invert the base-N code.  The last word slot and any
    out-of-range value map to the word-level ``<unk>`` id (1), exactly
    the strings host decode emits.

    Returns ``regroup((T,) int32 radix ids) -> (ceil(T/tpw),) int32``
    word ids with WORD conventions (pad=0 filler, unk=1; no bos/eos),
    ready for the word-level gram scorer.
    """
    import jax.numpy as jnp

    base, tpw = int(radix_base), int(tokens_per_word)
    pad_r, bos_r, eos_r = 0, base + 1, base + 2
    n_words = int(word_vocab_size) - 3  # <unk> shares the last word slot
    assert base ** tpw < 2 ** 31, "radix word values overflow int32"
    powers = np.asarray([base ** (tpw - 1 - j) for j in range(tpw)], np.int32)

    def regroup(ids):
        t = ids.shape[0]
        ids = ids.astype(jnp.int32)
        is_eos = ids == eos_r
        keep = (((jnp.cumsum(is_eos) - is_eos) == 0)
                & (ids != pad_r) & (ids != bos_r) & (ids != eos_r))
        pos = jnp.cumsum(keep) - 1
        n_digits = keep.sum()
        t_w = -(-t // tpw)  # static
        # digit buffer init'd to fillvalue 1 so the short tail pads itself
        d = jnp.ones((t_w * tpw,), jnp.int32)
        d = d.at[jnp.where(keep, pos, t_w * tpw)].set(ids, mode="drop")
        v = jnp.sum(jnp.maximum(d - 1, 0).reshape(t_w, tpw)
                    * jnp.asarray(powers)[None, :], axis=1)
        # slot n_words-1 is reserved for <unk>; >= len(vocab) decodes to
        # <unk> too (radix.py:130-137) -> word-level unk id 1
        wid = jnp.where(v < n_words - 1, v + 4, 1)
        valid = jnp.arange(t_w) < -(-n_digits // tpw)
        return jnp.where(valid, wid, 0)  # word-level <pad> elsewhere

    return regroup


# ------------------------------------------------------------ device scorer
def make_reward_device_fn(table: DfTable, eos_id: int = 3, pad_id: int = 0,
                          bos_id: int = 2, cider_weight: float = 1.0,
                          bleu_weight: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
                          regroup=None):
    """Build the jittable scorer.

    Returns ``score(ids (N, T) int32, img_idx (N,) int32, tbl, pack)
    -> (N,) f32`` weighted rewards (CIDEr-D x 10 x cider_weight +
    BLEU-1..4 x bleu_weight), where ``tbl`` is ``table.device_arrays()``
    and ``pack`` is ``ref_pack_device(...)``.  Trace-compatible across
    batches with the same (T, R, L) shapes.

    ``regroup`` (optional): per-sequence id transform applied before gram
    extraction — ``make_radix_to_word_fn`` for ACORT's digit ids; its
    output must use the word-level eos/pad/bos ids passed here.
    """
    import jax
    import jax.numpy as jnp

    probe = table.probe
    size = table.size
    ref_len = table.ref_len
    cider_weight = float(cider_weight)
    bleu_weight = [float(x) for x in bleu_weight]
    assert len(bleu_weight) == N_GRAMS
    with_bleu = max(bleu_weight) > 0

    def _grams(ids):
        """(T,) int32 sampled ids -> packed gram slots (G=4T,)."""
        t = ids.shape[0]
        is_eos = ids == eos_id
        before_eos = (jnp.cumsum(is_eos) - is_eos) == 0
        valid = before_eos & (ids != eos_id) & (ids != pad_id) & (ids != bos_id)
        pos = jnp.cumsum(valid) - 1
        length = valid.sum()
        # compact the word ids (host decode skips pad/bos anywhere in the
        # sequence, tokenizers/word.py:114-123)
        u = jnp.zeros((t,), jnp.uint32)
        u = u.at[jnp.where(valid, pos, t)].set((ids + 1).astype(jnp.uint32),
                                               mode="drop")
        z = jnp.zeros((1,), jnp.uint32)
        u1 = jnp.concatenate([u[1:], z])
        u2 = jnp.concatenate([u[2:], z, z])
        u3 = jnp.concatenate([u[3:], z, z, z])
        zt = jnp.zeros((t,), jnp.uint32)
        ghi = jnp.concatenate([zt, zt, u, (u << 16) | u1])
        glo = jnp.concatenate([u, (u << 16) | u1, (u1 << 16) | u2, (u2 << 16) | u3])
        starts = jnp.arange(t)
        gvalid = jnp.concatenate([starts <= length - n for n in range(1, 5)])
        gn = jnp.repeat(jnp.arange(N_GRAMS), t)
        return ghi, glo, gn, gvalid, length

    def _df_lookup(tbl, ghi, glo):
        idx0 = (_mix(ghi, glo) & np.uint32(size - 1)).astype(jnp.int32)
        idx = (idx0[:, None] + jnp.arange(probe, dtype=jnp.int32)) % size
        thi = tbl["hi"][idx]
        tlo = tbl["lo"][idx]
        hit = (thi == ghi[:, None]) & (tlo == glo[:, None]) & ((thi | tlo) != _EMPTY)
        return jnp.sum(jnp.where(hit, tbl["val"][idx], 0.0), axis=1)

    def _score_one(ids, tbl, rhi, rlo, rval, rcnt, rnorms, rlens, rwlens,
                   rvalid, n_refs):
        if regroup is not None:
            ids = regroup(ids)
        ghi, glo, gn, gvalid, length = _grams(ids)
        eq = (ghi[:, None] == ghi[None, :]) & (glo[:, None] == glo[None, :])
        eqv = eq & gvalid[None, :] & gvalid[:, None]
        tf = jnp.sum(eqv, axis=1)
        first = gvalid & (jnp.sum(jnp.tril(eqv, -1), axis=1) == 0)
        dfv = _df_lookup(tbl, ghi, glo)
        vals = tf.astype(jnp.float32) * (ref_len - dfv)
        n_onehot = jax.nn.one_hot(gn, N_GRAMS, dtype=jnp.float32)  # (G, 4)
        fv = first.astype(jnp.float32)
        cnorm = jnp.sqrt(jnp.sum(n_onehot * (fv * vals * vals)[:, None], axis=0))
        lh = jnp.maximum(length - 1, 0).astype(jnp.float32)
        # clipped cross term against each ref's precomputed grams
        ref_slot_valid = (rhi | rlo) != _EMPTY  # (R, L)
        m = ((ghi[:, None, None] == rhi[None]) & (glo[:, None, None] == rlo[None])
             & ref_slot_valid[None] & first[:, None, None])
        contrib = jnp.minimum(vals[:, None, None], rval[None]) * rval[None] * m
        per_gr = jnp.sum(contrib, axis=-1)  # (G, R)
        num = jnp.einsum("gn,gr->rn", n_onehot, per_gr)  # (R, 4)
        denom = cnorm[None, :] * rnorms  # (R, 4)
        sim = jnp.where(denom > 0, num / jnp.where(denom > 0, denom, 1.0), 0.0)
        gauss = jnp.exp(-((lh - rlens) ** 2) / (2 * SIGMA ** 2))  # (R,)
        sim = sim * (gauss * rvalid)[:, None]
        cider = 10.0 * jnp.sum(jnp.mean(sim, axis=1)) / jnp.maximum(n_refs, 1.0)
        total = cider_weight * cider
        if with_bleu:
            # metrics/bleu.py parity: clipped matches vs per-gram MAX ref
            # count (the same match matrix m), closest effective reflen,
            # tiny/small smoothing, per-image brevity penalty
            max_ref = jnp.max(jnp.where(m, rcnt[None], 0.0), axis=(1, 2))  # (G,)
            correct_g = jnp.minimum(tf.astype(jnp.float32), max_ref) * fv
            correct = jnp.einsum("gn,g->n", n_onehot, correct_g)  # (4,)
            testlen = length
            guess = jnp.maximum(testlen - jnp.arange(N_GRAMS), 0).astype(jnp.float32)
            # closest reflen, ties -> smaller (min over (|l-t|, l) tuples)
            big = jnp.int32(1 << 20)
            key = jnp.abs(rwlens - testlen) * 2048 + rwlens
            key = jnp.where(rvalid > 0, key, big)
            reflen = rwlens[jnp.argmin(key)].astype(jnp.float32)
            bleu = jnp.cumprod((correct + 1e-15) / (guess + 1e-9))
            bleu = bleu ** (1.0 / jnp.arange(1, N_GRAMS + 1))
            ratio = (testlen.astype(jnp.float32) + 1e-15) / (reflen + 1e-9)
            penalty = jnp.where(ratio < 1, jnp.exp(1.0 - 1.0 / ratio), 1.0)
            total = total + jnp.dot(bleu * penalty, jnp.asarray(bleu_weight))
        return total

    def score(ids, img_idx, tbl, pack):
        gather = lambda a: a[img_idx]  # noqa: E731 — (N, R, ...) per item
        return jax.vmap(
            lambda s, rhi, rlo, rval, rcnt, rnorms, rlens, rwlens, rvalid, nr:
            _score_one(s, tbl, rhi, rlo, rval, rcnt, rnorms, rlens, rwlens,
                       rvalid, nr)
        )(ids, gather(pack["hi"]), gather(pack["lo"]), gather(pack["val"]),
          gather(pack["cnt"]), gather(pack["norms"]),
          gather(pack["lens"]), gather(pack["wlens"]),
          gather(pack["ref_valid"]), gather(pack["n_refs"]))

    return score


def make_cider_device_fn(table: DfTable, eos_id: int = 3, pad_id: int = 0,
                         bos_id: int = 2):
    """Unweighted CIDEr-D-only scorer (back-compat name)."""
    return make_reward_device_fn(table, eos_id, pad_id, bos_id)


def leave_one_out_baseline(sc, spi: int):
    """Reference sample-mean baseline (scst/scorers.py:104-105 parity):
    per-item mean of the image's OTHER samples. ``sc`` is (B*spi,)."""
    import jax.numpy as jnp

    # spi is static under jit, so this fails at trace time, not with
    # silent NaN rewards (the host formula has the same 1/(spi-1))
    assert spi >= 2, f"sample-mean baseline needs >=2 samples/image, got {spi}"
    sums = jnp.sum(sc.reshape(-1, spi), axis=-1)
    return (jnp.repeat(sums, spi) - sc) / (spi - 1)
