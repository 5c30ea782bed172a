"""ctypes bindings for the native data loaders (build on first use).

jsonl_loader.cpp — JSONL field scanner; tar_index.cpp — tar shard member
indexer for the WebDataset fast path. One shared object, one build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRCS = [
    os.path.join(_HERE, "jsonl_loader.cpp"),
    os.path.join(_HERE, "tar_index.cpp"),
]
_SO = os.path.join(_HERE, "libtpdm_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", *_SRCS, "-o", _SO],
        check=True,
        capture_output=True,
    )


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or any(
            os.path.getmtime(_SO) < os.path.getmtime(s) for s in _SRCS
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.tpdm_tar_index.restype = ctypes.c_long
        lib.tpdm_tar_index.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.tpdm_read_jsonl_field.restype = ctypes.c_long
        lib.tpdm_read_jsonl_field.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_char)),
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.tpdm_free.argtypes = [ctypes.POINTER(ctypes.c_char)]
        _lib = lib
        return lib


def read_jsonl_field(path: str, key: str = "prompt") -> List[str]:
    """Extract string field `key` from every line of a JSONL file (C++)."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_char)()
    out_len = ctypes.c_long()
    n = lib.tpdm_read_jsonl_field(
        path.encode(), key.encode(), ctypes.byref(out), ctypes.byref(out_len)
    )
    if n < 0:
        raise OSError(f"native jsonl read failed for {path}")
    try:
        raw = ctypes.string_at(out, out_len.value)
    finally:
        lib.tpdm_free(out)
    if n == 0:
        return []
    values = raw.split(b"\0")[:-1]
    assert len(values) == n, (len(values), n)
    return [v.decode("utf-8") for v in values]


def tar_index(path: str) -> List[Tuple[str, int, int]]:
    """Member table of a tar shard: [(name, payload_offset, size), ...].

    One native pass over the 512-byte headers (USTAR + GNU longname; PAX
    extended headers skipped) — the WebDataset fast path reads members via
    seek instead of Python tarfile.
    """
    lib = _load()
    out = ctypes.POINTER(ctypes.c_char)()
    out_len = ctypes.c_long()
    n = lib.tpdm_tar_index(path.encode(), ctypes.byref(out), ctypes.byref(out_len))
    if n < 0:
        raise OSError(f"native tar index failed for {path}")
    try:
        raw = ctypes.string_at(out, out_len.value)
    finally:
        lib.tpdm_free(out)
    entries: List[Tuple[str, int, int]] = []
    for line in raw.split(b"\n"):
        if not line:
            continue
        off, size, name = line.split(b"\t", 2)
        entries.append((name.decode("utf-8"), int(off), int(size)))
    assert len(entries) == n, (len(entries), n)
    return entries
