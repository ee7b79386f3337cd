"""ctypes binding for the native host runtime (``native/tsasr_native.cpp``).

Loads ``libtsasr_native.so`` if built (``make -C native``), building it on
first use when a compiler is available; every entry point has a pure
Python fallback, so the framework runs without the native library (it is
the fast path for the host data-loader and eval metrics, the layers the
reference delegates to torchaudio/C++).
"""

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None
_TRIED = False
_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libtsasr_native.so")


def _lib_is_stale():
    src = os.path.join(os.path.dirname(_LIB_PATH), "tsasr_native.cpp")
    try:
        return os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
    except OSError:
        return False


def build(force=False):
    """Compile the native library (no-op if present and current)."""
    if os.path.exists(_LIB_PATH) and not force and not _lib_is_stale():
        return _LIB_PATH
    native_dir = os.path.dirname(_LIB_PATH)
    result = subprocess.run(["make", "-C", native_dir],
                            capture_output=True, text=True, check=False)
    if result.returncode != 0:
        raise RuntimeError(f"native build failed:\n{result.stderr}")
    return _LIB_PATH


def get_lib(auto_build=True):
    """The loaded library, or None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if (not os.path.exists(_LIB_PATH) or _lib_is_stale()) and auto_build:
        try:
            build()
        except (RuntimeError, OSError) as e:
            logger.info("native library unavailable (%s); using Python "
                        "fallbacks", e)
            if not os.path.exists(_LIB_PATH):
                return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    try:
        _bind(lib)
    except AttributeError as e:
        # stale prebuilt .so missing a newer symbol: never take down the
        # Python fallbacks over it
        logger.warning("native library is stale (%s); using Python "
                       "fallbacks — rebuild with `make -C native`", e)
        return None
    _LIB = lib
    return _LIB


def _bind(lib):
    lib.tsasr_wav_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int)]
    lib.tsasr_wav_read.restype = ctypes.c_int
    lib.tsasr_flac_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int)]
    lib.tsasr_flac_read.restype = ctypes.c_int
    lib.tsasr_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64)]
    lib.tsasr_resample.restype = ctypes.c_int
    lib.tsasr_mix.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64)]
    lib.tsasr_mix.restype = ctypes.c_int
    lib.tsasr_edit_ops.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int32)]
    lib.tsasr_free.argtypes = [ctypes.c_void_p]


def _take_floats(lib, ptr, n):
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.tsasr_free(ptr)
    return arr


def wav_read(path):
    """Native WAV decode -> (float32 (L,), sr); None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.tsasr_wav_read(path.encode(), ctypes.byref(out),
                            ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        return None
    return _take_floats(lib, out, n.value), sr.value


def flac_read(path):
    """Native FLAC decode -> (float32 (L,), sr); None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.tsasr_flac_read(path.encode(), ctypes.byref(out),
                             ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        return None
    return _take_floats(lib, out, n.value), sr.value


def resample(waveform, orig_freq, new_freq):
    """Native polyphase resample; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    wav = np.ascontiguousarray(waveform, np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.tsasr_resample(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav),
        int(orig_freq), int(new_freq), ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        return None
    return _take_floats(lib, out, n.value)


def mix(sigs, delays, target_idx, gain_nontarget_db, sample_rate, start,
        duration):
    """Native mixture synthesis over pre-resampled signals."""
    lib = get_lib()
    if lib is None:
        return None
    sigs = [np.ascontiguousarray(s, np.float32) for s in sigs]
    ptrs = (ctypes.POINTER(ctypes.c_float) * len(sigs))(
        *[s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for s in sigs])
    lens = (ctypes.c_int64 * len(sigs))(*[len(s) for s in sigs])
    dl = (ctypes.c_double * len(sigs))(*[float(d) for d in delays])
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.tsasr_mix(ptrs, lens, len(sigs), dl, int(target_idx),
                       float(gain_nontarget_db), int(sample_rate),
                       float(start),
                       -1.0 if duration is None else float(duration),
                       ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        return None
    return _take_floats(lib, out, n.value)


def edit_ops_ids(ref_ids, hyp_ids):
    """Native Levenshtein; returns (ops list of (op, ri, hi), counts dict)
    or None."""
    lib = get_lib()
    if lib is None:
        return None
    ref = np.ascontiguousarray(ref_ids, np.int32)
    hyp = np.ascontiguousarray(hyp_ids, np.int32)
    counts = (ctypes.c_int32 * 4)()
    ops_buf = (ctypes.c_int8 * (len(ref) + len(hyp) + 1))()
    ops_len = ctypes.c_int32()
    lib.tsasr_edit_ops(
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ref),
        hyp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(hyp),
        counts, ops_buf, ctypes.byref(ops_len))
    code_to_op = {0: "=", 1: "S", 2: "I", 3: "D"}
    ops = []
    i = j = 0
    for k in range(ops_len.value):
        op = code_to_op[ops_buf[k]]
        if op in ("=", "S"):
            ops.append((op, i, j))
            i += 1
            j += 1
        elif op == "D":
            ops.append((op, i, None))
            i += 1
        else:
            ops.append((op, None, j))
            j += 1
    counts_dict = {"=": counts[0], "S": counts[1], "I": counts[2],
                   "D": counts[3]}
    return ops, counts_dict
