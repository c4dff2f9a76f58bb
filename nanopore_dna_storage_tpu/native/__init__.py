"""ctypes bindings for the native host-runtime (libndsio.so).

Every function has a numpy fallback so the package works without the native
build; `ensure_built()` compiles the library on demand with make.
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libndsio.so"
_lib: Optional[ctypes.CDLL] = None


def ensure_built(quiet: bool = True) -> bool:
    """Build libndsio.so if missing. Returns availability."""
    global _lib
    if _lib is not None:
        return True
    if not _LIB_PATH.exists():
        r = subprocess.run(["make", "-C", str(_DIR)], capture_output=True)
        if r.returncode != 0:
            if not quiet:
                raise RuntimeError(r.stderr.decode())
            return False
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return False
    lib.nds_load_posts_batch.restype = ctypes.c_int
    lib.nds_crc8_batch.restype = None
    lib.nds_levenshtein_windows.restype = None
    _lib = lib
    return True


def available() -> bool:
    return ensure_built()


def load_posts_batch(paths: List[str], max_blocks: int,
                     nthreads: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Read+pad .post files into [B, max_blocks, 5, 8] float32 + nblocks [B].

    Uses the native threaded loader when available, else numpy.
    """
    n = len(paths)
    if ensure_built():
        out = np.zeros((n, max_blocks, 40), dtype=np.float32)
        nblk = np.zeros(n, dtype=np.int64)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = _lib.nds_load_posts_batch(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_longlong(max_blocks),
            nblk.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            ctypes.c_int(nthreads))
        if rc != 0:
            raise IOError(f"failed reading {paths[rc - 1]}")
        return out.reshape(n, max_blocks, 5, 8), nblk
    from ..io.post import read_post, pack_posts

    posts = [read_post(p) for p in paths]
    return pack_posts(posts, pad_to=max_blocks, bucket=1)


def crc8_batch_native(rows: np.ndarray) -> np.ndarray:
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    if rows.ndim == 1:
        rows = rows[None]
    if ensure_built():
        out = np.zeros(rows.shape[0], dtype=np.uint8)
        _lib.nds_crc8_batch(
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_longlong(rows.shape[0]),
            ctypes.c_longlong(rows.shape[1]),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    from ..coding.crc import crc8_batch

    return crc8_batch(rows)


def levenshtein_windows_native(needle: str, haystack: str,
                               starts: np.ndarray, wlen: int) -> np.ndarray:
    starts = np.ascontiguousarray(starts, dtype=np.int32)
    if ensure_built():
        out = np.zeros(len(starts), dtype=np.int32)
        _lib.nds_levenshtein_windows(
            needle.encode(), ctypes.c_int(len(needle)), haystack.encode(),
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.c_int(len(starts)), ctypes.c_int(wlen),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return out
    from ..signal.barcode import levenshtein_windows

    return levenshtein_windows(needle, haystack, starts, wlen)
