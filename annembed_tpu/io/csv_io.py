"""CSV IO: loading data to embed and writing embeddings.

Mirrors reference src/tools/io.rs:
  * ``get_toembed_from_csv`` (:115): numeric CSV -> (n, d) array with
    '#'/'%%' header skipping (:70) and Bernoulli row subsampling
    (:197-199)
  * ``write_csv_array2`` (:48) and ``write_csv_labeled_array2`` (:23):
    embeddings written at %%.5e precision, optionally label-prefixed.

The hot path is the native multithreaded parser
(native/csv_loader.cpp, built on demand with g++); a numpy fallback is
used when the native library is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libannembed_native.so"
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not _LIB_PATH.exists() and (_NATIVE_DIR / "Makefile").exists():
            logger.info("building native csv loader ...")
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        if _LIB_PATH.exists():
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.annembed_csv_parse.restype = ctypes.c_void_p
            lib.annembed_csv_parse.argtypes = [
                ctypes.c_char_p, ctypes.c_char, ctypes.c_double,
                ctypes.c_uint64, ctypes.c_int32]
            lib.annembed_csv_data.restype = ctypes.POINTER(ctypes.c_float)
            lib.annembed_csv_data.argtypes = [ctypes.c_void_p]
            lib.annembed_csv_rows.restype = ctypes.c_int64
            lib.annembed_csv_rows.argtypes = [ctypes.c_void_p]
            lib.annembed_csv_cols.restype = ctypes.c_int64
            lib.annembed_csv_cols.argtypes = [ctypes.c_void_p]
            lib.annembed_csv_free.argtypes = [ctypes.c_void_p]
            _lib = lib
    except Exception as exc:  # pragma: no cover - environment dependent
        logger.warning("native csv loader unavailable (%s); falling back "
                       "to numpy", exc)
    return _lib


_M64 = (1 << 64) - 1


def _keep_row(seed: int, offset: int, keep_prob: float) -> bool:
    """Bit-for-bit mirror of native/csv_loader.cpp::keep_row: the
    subsample decision hashes (seed, line byte offset), so the selected
    rows do not depend on thread count, chunking, or which parser ran."""
    z = (offset + 0x9E3779B97F4A7C15 * (seed + 1)) & _M64
    z ^= z >> 30
    z = (z * 0xBF58476D1CE4E5B9) & _M64
    z ^= z >> 27
    z = (z * 0x94D049BB133111EB) & _M64
    z ^= z >> 31
    return (z >> 11) * (1.0 / 9007199254740992.0) < keep_prob


def _numpy_parse(path: str, delimiter: str, subsample: float,
                 seed: int) -> np.ndarray:
    rows = []
    with open(path, "rb") as f:
        raw = f.read()
    pos, total = 0, len(raw)
    while pos < total:
        nl = raw.find(b"\n", pos)
        end = nl if nl >= 0 else total
        line_off = pos
        s = raw[pos:end].decode("utf-8", "replace").strip()
        pos = end + 1 if nl >= 0 else total
        if not s or s.startswith("#") or s.startswith("%"):
            continue
        if subsample < 1.0 and not _keep_row(seed, line_off, subsample):
            continue
        parts = s.split() if delimiter == " " \
            else [t.strip() for t in s.split(delimiter)]
        try:
            rows.append(np.array([float(t) for t in parts], np.float32))
        except ValueError as exc:
            raise ValueError(
                f"{path}: malformed CSV line at byte {line_off}: "
                f"{s[:80]!r}") from exc
    if not rows:
        return np.zeros((0, 0), np.float32)
    widths = {r.shape[0] for r in rows}
    if len(widths) != 1:
        raise ValueError(f"{path}: ragged CSV (row widths {sorted(widths)})")
    return np.stack(rows)


def get_toembed_from_csv(path: str | os.PathLike, delimiter: str = ",",
                         subsample: float = 1.0, seed: int = 0,
                         use_native: bool = True) -> np.ndarray:
    """Load a numeric CSV into a float32 (n, d) array.

    ``subsample`` keeps each row with that probability
    (reference io.rs:197-199, used for Higgs quality runs).
    """
    path = os.fspath(path)
    if use_native:
        lib = _load_native()
        if lib is not None:
            handle = lib.annembed_csv_parse(
                path.encode(), delimiter.encode()[:1], float(subsample),
                int(seed), 0)
            if handle:
                try:
                    r = lib.annembed_csv_rows(handle)
                    c = lib.annembed_csv_cols(handle)
                    ptr = lib.annembed_csv_data(handle)
                    arr = np.ctypeslib.as_array(ptr, shape=(r, c)).copy()
                finally:
                    lib.annembed_csv_free(handle)
                return arr
            logger.warning("native csv parse failed for %s; numpy fallback",
                           path)
    return _numpy_parse(path, delimiter, subsample, seed)


def write_csv_array2(path: str | os.PathLike, data) -> None:
    """Write (n, d) coordinates at %.5e (reference io.rs:48)."""
    np.savetxt(os.fspath(path), np.asarray(data), fmt="%.5e", delimiter=",")


def write_csv_labeled_array2(path: str | os.PathLike, labels, data) -> None:
    """label,coord...,coord rows (reference io.rs:23)."""
    data = np.asarray(data)
    labels = np.asarray(labels).reshape(-1, 1)
    with open(os.fspath(path), "w") as f:
        for lab, row in zip(labels[:, 0], data):
            f.write(str(lab) + "," + ",".join(f"{v:.5e}" for v in row)
                    + "\n")
