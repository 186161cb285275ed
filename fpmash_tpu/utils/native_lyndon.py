"""ctypes bindings for the native factorization library (liblyndon.so).

Fast host path for factorization families without a device kernel (ICFL
and the COMB variants); asserted equivalent to the scalar models in tests.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

ALG_IDS = {
    "CFL": (0, 0),
    "ICFL": (1, 0),
    "CFL_ICFL-10": (2, 10),
    "CFL_ICFL-20": (2, 20),
    "CFL_ICFL-30": (2, 30),
    "CFL_COMB": (3, 0),
    "ICFL_COMB": (4, 0),
    "CFL_ICFL_COMB-10": (5, 10),
    "CFL_ICFL_COMB-20": (5, 20),
    "CFL_ICFL_COMB-30": (5, 30),
}

_LIB = None
_TRIED = False


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(here, "native", "liblyndon.so")
    if not os.path.exists(path):
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", os.path.join(here, "native")],
                capture_output=True,
                timeout=120,
                check=True,
            )
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.lyn_factorize_batch.restype = ctypes.c_long
    lib.lyn_factorize_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _find_lib() is not None


def factorize_batch_native(windows: list[str], factorization: str):
    """Factor-length lists for each window via the native library.

    Returns ``list[list[int]]`` or None if the library / factorization is
    unavailable.
    """
    if factorization not in ALG_IDS:
        return None
    lib = _find_lib()
    if lib is None:
        return None
    alg_id, T = ALG_IDS[factorization]

    blob = "".join(windows).encode("ascii", "replace")
    offsets = np.zeros(len(windows) + 1, np.int64)
    for i, w in enumerate(windows):
        offsets[i + 1] = offsets[i] + len(w)

    cap = max(int(offsets[-1]) + len(windows), 16)
    out_lens = np.zeros(cap, np.int32)
    out_offsets = np.zeros(len(windows) + 1, np.int64)
    total = lib.lyn_factorize_batch(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(windows),
        alg_id,
        T,
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cap,
        out_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if total < 0:
        return None
    return [
        [int(x) for x in out_lens[out_offsets[i] : out_offsets[i + 1]]]
        for i in range(len(windows))
    ]
