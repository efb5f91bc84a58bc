"""File/artifact utilities (parity: reference ``sparse_caption/utils/file.py:40-325``
and ``utils/natural_sort.py:1-20``).

Covers the reference's dataset-bootstrap surface: cached download with hash
validation (``get_file``), archive extraction (tar/tar.gz/tar.bz2/zip),
directory listing helpers, and natural sorting. ``get_file`` additionally
accepts ``file://`` URLs and bare local paths so the flow is exercisable in
air-gapped environments (this rebuild's tests use local archives; the
public COCO/Karpathy URLs remain the defaults in the dataset classes).
"""

from __future__ import annotations

import hashlib
import logging
import os
import re
import shutil
import tarfile
import zipfile
from typing import List, Optional
from urllib.error import HTTPError, URLError
from urllib.request import urlretrieve

logger = logging.getLogger(__name__)


def file_size(path: str, suffix: str = "B") -> str:
    """Human-readable file size (reference file.py:40-43)."""
    num = float(os.path.getsize(path))
    for unit in ("", "Ki", "Mi", "Gi", "Ti", "Pi", "Ei", "Zi"):
        if abs(num) < 1024.0:
            return f"{num:3.1f} {unit}{suffix}"
        num /= 1024.0
    return f"{num:.1f} Yi{suffix}"


def list_dir(path: str) -> List[str]:
    """Sorted absolute paths of sub-directories (reference file.py:45-47)."""
    path = os.path.abspath(path)
    return sorted(os.path.join(path, d) for d in os.listdir(path)
                  if os.path.isdir(os.path.join(path, d)))


def list_files(path: str) -> List[str]:
    """Sorted absolute paths of files (reference file.py:49-52)."""
    path = os.path.abspath(path)
    return sorted(os.path.join(path, f) for f in os.listdir(path)
                  if os.path.isfile(os.path.join(path, f)))


def natural_keys(text: str):
    """Sort key for human ordering: 'ckpt_9' < 'ckpt_10'
    (reference natural_sort.py:10-20)."""
    return [int(tok) if tok.isdigit() else tok.lower() for tok in re.split(r"(\d+)", text)]


def natural_sort(items) -> List[str]:
    return sorted(items, key=natural_keys)


def _hash_file(fpath: str, algorithm: str = "sha256", chunk_size: int = 65535) -> str:
    """Streaming file hash (reference file.py:216-244)."""
    hasher = hashlib.md5() if algorithm == "md5" else hashlib.sha256()
    with open(fpath, "rb") as f:
        for chunk in iter(lambda: f.read(chunk_size), b""):
            hasher.update(chunk)
    return hasher.hexdigest()


def validate_file(fpath: str, file_hash: str, algorithm: str = "auto",
                  chunk_size: int = 65535) -> bool:
    """True iff the file's hash matches (reference file.py:247-269; 'auto'
    detects md5 vs sha256 by digest length)."""
    if algorithm == "sha256" or (algorithm == "auto" and len(file_hash) == 64):
        algo = "sha256"
    else:
        algo = "md5"
    return str(_hash_file(fpath, algo, chunk_size)) == str(file_hash)


def extract_archive(file_path: str, path: str = ".", archive_format: str = "auto") -> bool:
    """Extract tar/tar.gz/tar.bz2/zip archives (reference file.py:272-317);
    returns True if an archive was recognized and extracted."""
    if archive_format is None:
        return False
    formats = ["tar", "zip"] if archive_format == "auto" else [archive_format]
    for fmt in formats:
        if fmt == "tar":
            opener, is_match = tarfile.open, tarfile.is_tarfile
        elif fmt == "zip":
            opener, is_match = zipfile.ZipFile, zipfile.is_zipfile
        else:
            raise ValueError(f"unknown archive_format `{fmt}`")
        if not is_match(file_path):
            continue
        with opener(file_path) as archive:
            try:
                if fmt == "tar":
                    # refuse absolute-path / ".."-traversal members from a
                    # tampered tar (CVE-2007-4559 class). Python 3.12+ only;
                    # on older interpreters the legacy behavior stands.
                    try:
                        archive.extractall(path, filter="data")
                    except TypeError:
                        archive.extractall(path)
                else:
                    archive.extractall(path)
            except (tarfile.TarError, RuntimeError, KeyboardInterrupt):
                # do not leave a partial extraction behind
                raise
        return True
    return False


def get_file(
    fname: str,
    origin: str,
    dest_dir: str,
    file_hash: Optional[str] = None,
    hash_algorithm: str = "auto",
    extract: bool = False,
    archive_format: str = "auto",
) -> str:
    """Fetch ``origin`` into ``dest_dir/fname`` unless a (hash-)valid copy
    already exists; optionally extract (reference file.py:123-213).

    ``origin`` may be an http(s) URL, a ``file://`` URL, or a bare local
    path (the latter two are copied — they keep dataset bootstrap testable
    on machines without network egress).
    """
    os.makedirs(dest_dir, exist_ok=True)
    fpath = fname if os.path.isabs(fname) else os.path.join(dest_dir, fname)

    download = True
    if os.path.exists(fpath):
        download = file_hash is not None and not validate_file(fpath, file_hash, hash_algorithm)
        if download:
            logger.warning("local `%s` failed %s hash validation; re-fetching", fpath, hash_algorithm)

    if download:
        logger.info("fetching `%s` -> `%s`", origin, fpath)
        src_path = origin[len("file://"):] if origin.startswith("file://") else origin
        is_local = "://" not in origin or origin.startswith("file://")
        if (is_local and os.path.exists(fpath) and os.path.exists(src_path)
                and os.path.samefile(src_path, fpath)):
            # origin IS the destination (e.g. a hash-mismatched archive the
            # user pointed at directly): never copy-onto-self, and never
            # delete the user's only copy in the cleanup path below.
            raise RuntimeError(
                f"`{fpath}` failed hash validation and origin points at the same file; "
                "refusing to delete it — refetch from a real source or fix file_hash")
        # fetch to a temp name and rename on success so a failed/partial
        # fetch can never destroy a pre-existing file at fpath
        tmp_path = fpath + ".part"
        try:
            if is_local:
                shutil.copyfile(src_path, tmp_path)
            else:
                try:
                    urlretrieve(origin, tmp_path)
                except HTTPError as e:
                    raise RuntimeError(f"URL fetch failure on {origin}: {e.code} -- {e.msg}")
                except URLError as e:
                    raise RuntimeError(f"URL fetch failure on {origin}: {e.errno} -- {e.reason}")
            if file_hash is not None and not validate_file(tmp_path, file_hash, hash_algorithm):
                raise RuntimeError(f"hash mismatch after fetching `{origin}`")
            os.replace(tmp_path, fpath)
        except (Exception, KeyboardInterrupt):
            if os.path.exists(tmp_path):
                os.remove(tmp_path)
            raise

    if extract:
        extract_archive(fpath, dest_dir, archive_format)
    return fpath


def zip_dir(target_dir: str, save_path: str) -> str:
    """Zip a directory tree (reference file.py:320-325)."""
    base, _ = os.path.splitext(save_path)
    return shutil.make_archive(base, "zip", root_dir=os.path.dirname(target_dir),
                               base_dir=os.path.basename(target_dir))
