"""ctypes binding for the native batch featurizer (native/fasthash.cpp).

Loads ``libfasthash.so`` (built by ``make -C native``; auto-built on first
use if a compiler is available) and exposes :func:`featurize_batch` with
bit-for-bit parity to the pure-Python featurizer — the host-side hot loop at
large corpus scale. Falls back transparently when the library is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "build", "libfasthash.so")

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_build() -> None:
    makefile = os.path.join(_REPO_ROOT, "native", "Makefile")
    if not os.path.exists(makefile):
        return
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native")],
            capture_output=True,
            timeout=120,
            check=False,
        )
    except (OSError, subprocess.TimeoutExpired):
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH):
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ragfin_featurize_batch.restype = ctypes.c_int
        lib.ragfin_featurize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_uint64,
            ctypes.c_float,
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        if lib.ragfin_fasthash_abi_version() != 1:
            return None
        _lib = lib
    except (OSError, AttributeError):
        # AttributeError: a stale/foreign .so missing an exported symbol
        # (e.g. a build left behind after a failed make on updated source)
        # must fall back to the Python path like any other load failure —
        # the module's transparent-fallback contract.
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def featurize_batch(
    texts: Sequence[str],
    vocab_size: int,
    bigram_weight: float = 1.0,
    max_feats: int = 4096,
) -> Optional[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Native batch featurize → (ids [B, max_feats], tf [B, max_feats],
    lens [B]); None when the native library is unavailable."""
    lib = _load()
    if lib is None or not texts:
        return None
    n = len(texts)
    encoded = [t.encode("utf-8") for t in texts]
    arr = (ctypes.c_char_p * n)(*encoded)
    out_ids = np.zeros((n, max_feats), np.int32)
    out_tf = np.zeros((n, max_feats), np.float32)
    out_lens = np.zeros((n,), np.int32)
    rc = lib.ragfin_featurize_batch(
        arr, n, vocab_size, bigram_weight, max_feats, out_ids, out_tf, out_lens
    )
    if rc != 0:
        return None
    return out_ids, out_tf, out_lens
