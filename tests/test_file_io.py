"""utils/file_io: cached fetch + hash validation + extraction (parity model:
reference sparse_caption/utils/file.py:123-325, natural_sort.py), exercised
offline via file:// origins, plus the dataset-bootstrap wiring."""

import hashlib
import os
import zipfile

import pytest

from sparse_caption_tpu.utils import file_io


@pytest.fixture()
def archive(tmp_path):
    src = tmp_path / "payload"
    src.mkdir()
    (src / "dataset_test.json").write_text('{"images": []}')
    zpath = tmp_path / "caption_datasets.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(src / "dataset_test.json", "dataset_test.json")
    return zpath


def test_get_file_local_copy_validate_extract(tmp_path, archive):
    dest = tmp_path / "dest"
    sha = hashlib.sha256(archive.read_bytes()).hexdigest()
    out = file_io.get_file("caption_datasets.zip", f"file://{archive}", str(dest),
                           file_hash=sha, extract=True)
    assert os.path.isfile(out)
    assert (dest / "dataset_test.json").is_file()
    # second call: cached (mutate origin to prove no re-fetch happens)
    archive.unlink()
    out2 = file_io.get_file("caption_datasets.zip", f"file://{archive}", str(dest),
                            file_hash=sha, extract=False)
    assert out2 == out


def test_get_file_hash_mismatch_refetches_and_raises(tmp_path, archive):
    dest = tmp_path / "dest"
    dest.mkdir()
    (dest / "caption_datasets.zip").write_bytes(b"corrupted")
    bad = "0" * 64
    with pytest.raises(RuntimeError):
        file_io.get_file("caption_datasets.zip", f"file://{archive}", str(dest), file_hash=bad)


def test_get_file_refuses_to_delete_self_origin(tmp_path, archive):
    """If origin IS the destination and the hash mismatches, get_file must
    refuse rather than copy-onto-self / delete the user's only copy."""
    bad = "0" * 64
    with pytest.raises(RuntimeError, match="same file"):
        file_io.get_file(str(archive), f"file://{archive}", str(archive.parent), file_hash=bad)
    assert archive.is_file()  # untouched


def test_get_file_failed_fetch_preserves_existing_file(tmp_path, archive):
    """A hash-mismatched refetch that FAILS must not destroy the
    pre-existing (even if stale) destination file."""
    dest = tmp_path / "dest"
    dest.mkdir()
    stale = dest / "caption_datasets.zip"
    stale.write_bytes(b"stale-but-mine")
    bad = "0" * 64
    with pytest.raises(RuntimeError):
        file_io.get_file("caption_datasets.zip", f"file://{archive}", str(dest), file_hash=bad)
    assert stale.read_bytes() == b"stale-but-mine"
    assert not (dest / "caption_datasets.zip.part").exists()


def test_extract_archive_rejects_traversal_tar(tmp_path):
    """Tarball path traversal (CVE-2007-4559 class) must not escape
    dest_dir on interpreters that support extraction filters."""
    import sys
    import tarfile as tf

    if sys.version_info < (3, 12):
        pytest.skip("tar extraction filter requires Python 3.12+")
    evil = tmp_path / "evil.tar"
    payload = tmp_path / "payload.txt"
    payload.write_text("x")
    with tf.open(evil, "w") as t:
        info = t.gettarinfo(str(payload), arcname="../escaped.txt")
        with open(payload, "rb") as f:
            t.addfile(info, f)
    dest = tmp_path / "jail" / "inner"
    dest.mkdir(parents=True)
    with pytest.raises(tf.TarError):
        file_io.extract_archive(str(evil), str(dest))
    assert not (tmp_path / "jail" / "escaped.txt").exists()


def test_validate_file_auto_detects_algorithm(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"hello")
    assert file_io.validate_file(str(p), hashlib.sha256(b"hello").hexdigest())
    assert file_io.validate_file(str(p), hashlib.md5(b"hello").hexdigest())
    assert not file_io.validate_file(str(p), "0" * 64)


def test_natural_sort():
    xs = ["ckpt_10", "ckpt_9", "ckpt_1", "b", "a2", "a10"]
    assert file_io.natural_sort(xs) == ["a2", "a10", "b", "ckpt_1", "ckpt_9", "ckpt_10"]


def test_list_helpers_and_zip_dir(tmp_path):
    d = tmp_path / "tree"
    (d / "sub").mkdir(parents=True)
    (d / "f.txt").write_text("x")
    assert file_io.list_files(str(d)) == [str(d / "f.txt")]
    assert file_io.list_dir(str(d)) == [str(d / "sub")]
    out = file_io.zip_dir(str(d), str(tmp_path / "tree.zip"))
    assert zipfile.is_zipfile(out)


def test_karpathy_fetches_archive_from_file_url(tmp_path):
    """Missing raw JSON triggers the reference's bootstrap flow
    (karpathy.py:82-93): fetch + extract the split archive, then process."""
    import json

    from sparse_caption_tpu.config import Config
    from sparse_caption_tpu.data import get_dataset

    raw = {
        "images": [
            {
                "filepath": "val2014", "filename": f"COCO_val2014_{i:012d}.jpg",
                "imgid": i, "cocoid": i, "split": "train",
                "sentences": [{"raw": "a dog runs", "tokens": ["a", "dog", "runs"]}],
            }
            for i in range(3)
        ]
    }
    src = tmp_path / "src"
    src.mkdir()
    (src / "dataset_coco.json").write_text(json.dumps(raw))
    zpath = tmp_path / "caption_datasets.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(src / "dataset_coco.json", "dataset_coco.json")

    ddir = tmp_path / "dataset"
    ddir.mkdir()
    cfg = Config(dataset="mscoco", dataset_dir=str(ddir), log_dir=str(tmp_path / "log"),
                 dataset_archive_url=f"file://{zpath}")
    ds = get_dataset("mscoco")(cfg)
    ds.prepare_data()
    assert (ddir / "dataset_coco.json").is_file()
    assert len(ds.data["train"]) == 3
