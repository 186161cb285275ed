"""ctypes bindings for the native IO library (native/libfpio.so).

The native layer replaces the reference's C++ host-side parsing (kseq.h
streaming FASTA/FASTQ, Sketch::initFromFingerprints' line parser) with
batch parsers that return flat numpy arrays.  Falls back to the pure-Python
readers when the library hasn't been built (``make -C native``); the
Python and native parsers are asserted equivalent in tests.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libfpio.so")
    if not os.path.exists(path):
        # try building it once, quietly
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
    lib.fpio_parse_fingerprint.restype = ctypes.c_void_p
    lib.fpio_parse_fingerprint.argtypes = [ctypes.c_char_p, ctypes.c_long]
    lib.fpio_fingerprint_n_lines.restype = ctypes.c_long
    lib.fpio_fingerprint_n_lines.argtypes = [ctypes.c_void_p]
    lib.fpio_fingerprint_n_values.restype = ctypes.c_long
    lib.fpio_fingerprint_n_values.argtypes = [ctypes.c_void_p]
    lib.fpio_fingerprint_values.restype = ctypes.POINTER(ctypes.c_uint64)
    lib.fpio_fingerprint_values.argtypes = [ctypes.c_void_p]
    lib.fpio_fingerprint_line_offsets.restype = ctypes.POINTER(ctypes.c_uint64)
    lib.fpio_fingerprint_line_offsets.argtypes = [ctypes.c_void_p]
    lib.fpio_fingerprint_ids.restype = ctypes.POINTER(ctypes.c_char)
    lib.fpio_fingerprint_ids.argtypes = [ctypes.c_void_p]
    lib.fpio_fingerprint_ids_size.restype = ctypes.c_long
    lib.fpio_fingerprint_ids_size.argtypes = [ctypes.c_void_p]
    lib.fpio_fingerprint_free.argtypes = [ctypes.c_void_p]

    lib.fpio_parse_seq.restype = ctypes.c_void_p
    lib.fpio_parse_seq.argtypes = [ctypes.c_char_p]
    lib.fpio_seq_n_records.restype = ctypes.c_long
    lib.fpio_seq_n_records.argtypes = [ctypes.c_void_p]
    lib.fpio_seq_data.restype = ctypes.POINTER(ctypes.c_char)
    lib.fpio_seq_data.argtypes = [ctypes.c_void_p]
    lib.fpio_seq_data_size.restype = ctypes.c_long
    lib.fpio_seq_data_size.argtypes = [ctypes.c_void_p]
    lib.fpio_seq_offsets.restype = ctypes.POINTER(ctypes.c_uint64)
    lib.fpio_seq_offsets.argtypes = [ctypes.c_void_p]
    lib.fpio_seq_names.restype = ctypes.POINTER(ctypes.c_char)
    lib.fpio_seq_names.argtypes = [ctypes.c_void_p]
    lib.fpio_seq_names_size.restype = ctypes.c_long
    lib.fpio_seq_names_size.argtypes = [ctypes.c_void_p]
    lib.fpio_seq_comments.restype = ctypes.POINTER(ctypes.c_char)
    lib.fpio_seq_comments.argtypes = [ctypes.c_void_p]
    lib.fpio_seq_comments_size.restype = ctypes.c_long
    lib.fpio_seq_comments_size.argtypes = [ctypes.c_void_p]
    lib.fpio_seq_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _find_lib() is not None


def parse_fingerprint_file(path: str, max_lines: int = 0):
    """Parse a fingerprint .txt natively.

    Returns ``(ids, values, offsets)``: ``ids`` is a list of per-line ID
    strings, ``values`` a flat u64 array, ``offsets[i]:offsets[i+1]`` the
    slice for line i.  None if the native library is unavailable.
    """
    lib = _find_lib()
    if lib is None:
        return None
    h = lib.fpio_parse_fingerprint(path.encode(), max_lines)
    if not h:
        raise FileNotFoundError(path)
    try:
        n = lib.fpio_fingerprint_n_lines(h)
        nv = lib.fpio_fingerprint_n_values(h)
        values = np.ctypeslib.as_array(lib.fpio_fingerprint_values(h), shape=(nv,)).copy() if nv else np.zeros(0, np.uint64)
        offsets = np.ctypeslib.as_array(
            lib.fpio_fingerprint_line_offsets(h), shape=(n + 1,)
        ).copy()
        ids_blob = ctypes.string_at(lib.fpio_fingerprint_ids(h), lib.fpio_fingerprint_ids_size(h))
        ids = ids_blob.decode("utf-8", "replace").split("\0")[:-1] if ids_blob else []
        return ids, values.astype(np.uint64), offsets.astype(np.int64)
    finally:
        lib.fpio_fingerprint_free(h)


def parse_seq_file(path: str):
    """Parse FASTA/FASTQ natively.

    Returns ``(names, comments, blob, offsets)`` where ``blob`` is the
    concatenated sequence bytes and ``offsets`` the per-record bounds.
    None if unavailable (or gzipped input, which uses the Python reader).
    """
    if path.endswith(".gz"):
        return None
    lib = _find_lib()
    if lib is None:
        return None
    h = lib.fpio_parse_seq(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        n = lib.fpio_seq_n_records(h)
        blob = ctypes.string_at(lib.fpio_seq_data(h), lib.fpio_seq_data_size(h))
        offsets = np.ctypeslib.as_array(lib.fpio_seq_offsets(h), shape=(n + 1,)).copy()
        names = ctypes.string_at(lib.fpio_seq_names(h), lib.fpio_seq_names_size(h))
        comments = ctypes.string_at(
            lib.fpio_seq_comments(h), lib.fpio_seq_comments_size(h)
        )
        names = names.decode("utf-8", "replace").split("\0")[:-1] if names else []
        comments = comments.decode("utf-8", "replace").split("\0")[:-1] if comments else []
        return names, comments, blob, offsets.astype(np.int64)
    finally:
        lib.fpio_seq_free(h)
