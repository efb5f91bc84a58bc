"""Run configuration: a mutable attr-bag with a versioned JSON contract.

Capability parity with the reference ``sparse_caption/utils/config.py:20-182``:
components merge their argparse groups into one namespace, the result is
serialized to ``<log_dir>/config.json`` at train start, and old configs are
migrated forward on load via an explicit version table.  Components may write
derived values back at runtime (e.g. the tokenizer records vocab size and
special-token ids, as the reference does at ``tokenizer.py:300-310``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, List

CONFIG_VERSION = 1

# Migration table: version -> fn(dict) -> dict that upgrades to version+1.
_MIGRATIONS: Dict[int, Callable[[dict], dict]] = {}


def register_migration(from_version: int):
    def deco(fn):
        _MIGRATIONS[from_version] = fn
        return fn

    return deco


class Config:
    """Attribute bag over a plain dict; JSON round-trippable."""

    def __init__(self, **kwargs: Any):
        self.__dict__["_data"] = {}
        self._data.update(kwargs)
        self._data.setdefault("config_version", CONFIG_VERSION)

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self.__dict__["_data"][name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name: str, value: Any) -> None:
        self._data[name] = value

    def __delattr__(self, name: str) -> None:
        del self._data[name]

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def get(self, name: str, default: Any = None) -> Any:
        return self._data.get(name, default)

    def update(self, other: "Config | dict") -> "Config":
        self._data.update(other._data if isinstance(other, Config) else other)
        return self

    def to_dict(self) -> dict:
        return dict(self._data)

    def replace(self, **kwargs) -> "Config":
        out = Config(**self._data)
        out._data.update(kwargs)
        return out

    def __repr__(self) -> str:
        body = ",\n  ".join(f"{k}={v!r}" for k, v in sorted(self._data.items()))
        return f"Config(\n  {body}\n)"

    # launch-topology keys, never run semantics: persisting them would make
    # any later entry that loads this config.json re-enter multi-process
    # init (jax.distributed.initialize blocks waiting for the other
    # processes) or rebuild a mesh the current host cannot satisfy
    TRANSIENT_KEYS = (
        "dist_coordinator", "dist_num_processes", "dist_process_id",
        "dist_local_device_count", "dist_platform", "config_save_skip",
    )

    # -- persistence ---------------------------------------------------------
    def save_config(self, log_dir: str, exist_ok: bool = True) -> str:
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, "config.json")
        if os.path.isfile(path) and not exist_ok:
            raise FileExistsError(path)
        data = {k: v for k, v in self._data.items() if k not in self.TRANSIENT_KEYS}
        if data.pop("mesh_shape_auto", None):
            # mesh_shape derived from THIS launch's global device count
            # (multi-process default) — not portable to a later eval host
            data.pop("mesh_shape", None)
        with open(path, "w") as f:
            json.dump(data, f, indent=2, sort_keys=True, default=str)
        return path

    @classmethod
    def load_config_json(cls, path: str, verbose: bool = True) -> "Config":
        if os.path.isdir(path):
            path = os.path.join(path, "config.json")
        with open(path) as f:
            data = json.load(f)
        data = migrate(data)
        return cls(**data)


def migrate(data: dict) -> dict:
    """Upgrade a raw config dict to CONFIG_VERSION via the migration table."""
    v = int(data.get("config_version", 0))
    while v < CONFIG_VERSION:
        fn = _MIGRATIONS.get(v)
        if fn is None:
            v += 1
            continue
        data = fn(dict(data))
        v += 1
    data["config_version"] = CONFIG_VERSION
    return data


@register_migration(0)
def _v0_to_v1(data: dict) -> dict:
    # v0 configs predate the explicit version field; nothing else to rewrite.
    return data


def str_to_none(s: str):
    """argparse type: 'none'/'null'/'' -> None, else the string itself —
    lets reference-style commands pass an explicit 'no value' (the
    reference's utils/misc.py str_to_none; a Python None inside argparse
    ``choices`` is only satisfiable by omitting the flag)."""
    return None if str(s).lower() in ("none", "null", "") else s


def list_of_ints(s: str) -> List[int]:
    """argparse type: '0,0,0,1,1,1' -> [0,0,0,1,1,1] (reference misc.py csv
    types); also accepts the reference command recipes' python-tuple form
    '(0, 0, 0, 1, 1, 1)' (resources/commands_acort.sh:48)."""
    if not s:
        return []
    s = str(s).replace(" ", "").strip("()[]")
    if not s:
        return []
    return [int(x) for x in s.split(",")]


def list_of_floats(s: str) -> List[float]:
    if not s:
        return []
    return [float(x) for x in str(s).replace(" ", "").split(",")]


def str_or_none(s: str):
    return None if s in ("", "none", "None", None) else s
