"""Data pipeline tests: ingestion, splits, batching shapes (parity model:
reference collate contract, sparse_caption/data/collate.py:153-168)."""

import os

import numpy as np
import pytest

from sparse_caption_tpu.config import Config
from sparse_caption_tpu.data import get_dataset
from sparse_caption_tpu.data.batching import BatchLoader, CaptionBatcher
from sparse_caption_tpu.data.features import FeatureCache, FeatureSource, default_bu_dirs
from sparse_caption_tpu.tokenizers import get_tokenizer


@pytest.fixture()
def prepared(fixture_dataset, tmp_path):
    cfg = Config(
        log_dir=str(tmp_path / "run"),
        dataset_dir=fixture_dataset,
        vocab_size=256,
        max_seq_length=12,
        seq_per_img=3,
    )
    ds = get_dataset("mscoco_testing")(cfg)
    ds.prepare_data()
    tok = get_tokenizer("word")(cfg)
    return cfg, ds, tok


def test_splits_and_generation_mode(prepared):
    cfg, ds, tok = prepared
    train = ds.get_split("train")
    assert len(train) == 4 * 5  # 4 train images x 5 captions
    gen = ds.get_split("val", generation_mode=True)
    assert len(gen) == 2  # deduped per image
    assert all("all_gts" in d and len(d["all_gts"]) == 5 for d in gen)
    with pytest.raises(ValueError):
        ds.get_split("bogus")


def test_image_filename_to_id(prepared):
    _, ds, _ = prepared
    assert ds.image_filename_to_id("COCO_val2014_000000522418.jpg") == 522418
    with pytest.raises(ValueError):
        ds.image_filename_to_id("foo.png")


def test_batch_shapes_static(prepared, fixture_dataset):
    cfg, ds, tok = prepared
    src = FeatureSource(**default_bu_dirs(fixture_dataset), max_regions=8, att_feat_size=16)
    batcher = CaptionBatcher(cfg, tok, src)
    recs = ds.get_split("train")[:4]
    batch = batcher(recs)
    B, spi, L = 4, cfg.seq_per_img, cfg.max_seq_length
    assert batch["att_feats"].shape == (B, 8, 16)
    assert batch["att_masks"].shape == (B, 8)
    assert batch["fc_feats"].shape == (B, 16)
    assert batch["boxes"].shape == (B, 8, 4)
    assert batch["seqs"].shape == (B * spi, L)
    assert batch["masks"].shape == (B * spi, L)
    assert batch["seqs"].dtype == np.int32
    # every caption row starts with BOS; pad tail is masked out
    assert (batch["seqs"][:, 0] == tok.bos_token_id).all()
    assert ((batch["seqs"] != 0) == (batch["masks"] > 0)).all()
    # att mask marks true regions only
    counts = batch["att_masks"].sum(1)
    assert (counts >= 3).all() and (counts <= 5).all()


def test_loader_train_drop_last_and_eval_padding(prepared, fixture_dataset):
    cfg, ds, tok = prepared
    src = FeatureSource(**default_bu_dirs(fixture_dataset), max_regions=8, att_feat_size=16)
    batcher = CaptionBatcher(cfg, tok, src)
    train = BatchLoader(ds.get_split("train"), batcher, batch_size=3, train=True)
    batches = list(train)
    assert len(batches) == 20 // 3
    assert all(b["batch_valid"] == 3 for b in batches)
    # eval: 2 records, batch 3 -> one padded batch
    ev = BatchLoader(ds.get_split("val", generation_mode=True), batcher, batch_size=3, train=False)
    (b,) = list(ev)
    assert b["batch_valid"] == 2
    assert b["att_feats"].shape[0] == 3
    assert b["image_ids"][1] == b["image_ids"][2]  # padded by repetition


def test_loader_reshuffles_each_epoch(prepared, fixture_dataset):
    cfg, ds, tok = prepared
    src = FeatureSource(**default_bu_dirs(fixture_dataset), max_regions=8, att_feat_size=16)
    batcher = CaptionBatcher(cfg, tok, src)
    loader = BatchLoader(ds.get_split("train"), batcher, batch_size=4, train=True)
    e1 = [tuple(b["image_ids"]) for b in loader]
    e2 = [tuple(b["image_ids"]) for b in loader]
    assert e1 != e2 or len(e1) <= 1


def test_loader_abandoned_mid_epoch_releases_prefetch_thread(prepared, fixture_dataset):
    """Breaking out of a prefetching loader must not leak the producer
    thread (it would block forever on the bounded queue) and must still
    advance the epoch so the next pass gets a fresh shuffle order."""
    import threading
    import time

    cfg, ds, tok = prepared
    src = FeatureSource(**default_bu_dirs(fixture_dataset), max_regions=8, att_feat_size=16)
    batcher = CaptionBatcher(cfg, tok, src)
    loader = BatchLoader(ds.get_split("train"), batcher, batch_size=2, train=True, prefetch=1)
    before = threading.active_count()
    epoch0 = loader._epoch
    for _ in loader:
        break  # abandon mid-epoch (closes the generator on GC/del)
    for _ in range(50):  # give the producer a moment to observe the stop
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before, "prefetch producer thread leaked"
    assert loader._epoch == epoch0 + 1, "abandoned epoch must still advance the shuffle"
    # and the loader remains fully usable afterwards
    n = sum(1 for _ in loader)
    assert n == len(loader)


def test_feature_cache_hits(prepared, fixture_dataset):
    cache = FeatureCache(min_free_ram=0.0)
    src = FeatureSource(**default_bu_dirs(fixture_dataset), max_regions=8, att_feat_size=16, cache=cache)
    _, ds, _ = prepared
    img_id = ds.get_split("train")[0]["img_id"]
    src.load(img_id)
    misses = cache.misses
    src.load(img_id)
    assert cache.misses == misses and cache.hits > 0


def test_caption_json_dump(prepared, tmp_path):
    cfg, ds, _ = prepared
    out = str(tmp_path / "pred.json")
    ds.coco_caption_json_dump([("COCO_val2014_000000100002.jpg", "a dog")], out)
    import json

    data = json.load(open(out))
    assert data == [{"image_id": 100002, "caption": "a dog"}]


def test_abandoned_iteration_advances_epoch_exactly_once(prepared, fixture_dataset):
    """Epoch accounting must be timing-independent: a consumer that breaks
    after the producer thread has already exhausted the epoch (but is still
    blocked on the sentinel put) must see the counter advance EXACTLY once
    — a double-advance silently desynchronizes multi-process global batch
    order (every process must enumerate the identical shuffle)."""
    import time as _time

    cfg, ds, tok = prepared
    from sparse_caption_tpu.data.batching import BatchLoader, CaptionBatcher
    from sparse_caption_tpu.data.features import FeatureSource

    src = FeatureSource(**default_bu_dirs(fixture_dataset), max_regions=8, att_feat_size=16)
    batcher = CaptionBatcher(cfg, tok, src)
    recs = ds.get_split("train", generation_mode=True)  # 4 records
    loader = BatchLoader(recs, batcher, batch_size=2, train=True, seed=3, prefetch=2)
    assert loader._epoch == 0
    it = iter(loader)
    next(it)  # queue(2) holds both batches; producer exhausts + blocks on sentinel
    _time.sleep(0.3)  # let the producer reach the blocked sentinel put
    it.close()  # consumer abandons
    assert loader._epoch == 1, "abandonment near epoch end double-advanced the epoch"
    # and a fully-consumed epoch advances once too
    n = sum(1 for _ in loader)
    assert n == 2 and loader._epoch == 2
    # inline (prefetch=0) abandonment also advances exactly once
    loader0 = BatchLoader(recs, batcher, batch_size=2, train=True, seed=3, prefetch=0)
    it0 = iter(loader0)
    next(it0)
    it0.close()
    assert loader0._epoch == 1


def test_annotation_file(prepared):
    cfg, ds, _ = prepared
    import json

    ann = json.load(open(ds.annotation_file_path()))
    assert len(ann["images"]) == 8  # 4 train (for --split train eval) + 2 val + 2 test
    assert len(ann["annotations"]) == 40

    # a cached file that predates train-GT inclusion (no __splits__ marker)
    # is regenerated, not trusted — otherwise --split train on an old run
    # dir would score against empty reference lists
    path = ds.annotation_file_path()
    stale = {k: v for k, v in ann.items() if k != "__splits__"}
    stale["annotations"] = [a for a in ann["annotations"] if a["image_id"] >= 100002]
    with open(path, "w") as f:
        json.dump(stale, f)
    fresh = json.load(open(ds.annotation_file_path()))
    assert fresh["__splits__"] == ["train", "val", "test"]
    assert len(fresh["annotations"]) == 40


REFERENCE_DATA = "/root/reference/tests/data"


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA), reason="reference mount not available")
def test_reference_fixture_data_interop(tmp_path):
    """The data layer consumes the REFERENCE REPO'S OWN fixture artifacts
    unchanged: its Karpathy-format `dataset_coco_testing.json` (5 real COCO
    images) and its precomputed bottom-up `.npy` features under
    `bu/{cocobu_att,cocobu_fc,cocobu_box_relative}` (reference
    data/mscoco.py:101-103 + collate.py:85-90 layout) — an end-to-end
    cross-framework dataset-compatibility anchor, real features included."""
    cfg = Config(dataset="mscoco_testing", dataset_dir=REFERENCE_DATA,
                 log_dir=str(tmp_path), tokenizer="word", vocab_size=64,
                 batch_size=2, seq_per_img=5, max_seq_length=16,
                 max_att_regions=36, att_feat_size=2048,
                 cache_min_free_ram=1.0)
    ds = get_dataset("mscoco_testing")(cfg)
    ds.prepare_data()
    assert len(ds.get_split("train", generation_mode=True)) >= 2  # train images (+restval fold)
    assert len(ds.get_split("val", generation_mode=True)) >= 1

    tok = get_tokenizer("word")(cfg)
    dirs = default_bu_dirs(REFERENCE_DATA)
    src = FeatureSource(att_dir=dirs["att_dir"], fc_dir=None, box_dir=dirs["box_dir"],
                        max_regions=36, att_feat_size=2048,
                        cache=FeatureCache(1.0))
    batcher = CaptionBatcher(cfg, tok, src)
    loader = BatchLoader(ds.get_split("train"), batcher, 2, train=True, seed=0)
    batch = next(iter(loader))
    assert batch["att_feats"].shape == (2, 36, 2048)
    assert batch["boxes"].shape == (2, 36, 4)
    # real features: non-degenerate values
    assert float(np.abs(batch["att_feats"]).sum()) > 0
    assert batch["seqs"].shape[0] == 2 * 5
