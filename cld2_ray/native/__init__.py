"""ctypes shim for the C hot-loop kernel (quadscan.c).

Compiles the kernel on first import (cached ``quadscan.so`` next to the
source, atomic rename so concurrent Ray actors race safely) and exposes
``quad_octa_scan``. If no compiler is available the module degrades to
``AVAILABLE = False`` and callers use the bit-equal numpy path
(cld2_ray/functions/hits.py) — the tests cross-check the two.

The C call releases the GIL (plain ctypes), so actor-pool threads
overlap fully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

def _tune_malloc() -> None:
    """Keep large free buffers in the heap instead of munmap'ing them.

    The scoring kernels allocate multi-MB numpy temporaries per batch;
    with glibc defaults each batch munmaps them back to the OS and the
    next batch pays a page-fault storm (measured 2-10x wall-time swings
    on virtualised hosts). mallopt(M_MMAP_THRESHOLD/M_TRIM_THRESHOLD)
    makes the allocator reuse those buffers — steady-state per-batch
    time becomes flat. Runs per-process (import-time), so every Ray
    worker that imports cld2_ray gets it without env plumbing.
    """
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        libc.mallopt(ctypes.c_int(-3), ctypes.c_int(1 << 30))  # M_MMAP_THRESHOLD
        libc.mallopt(ctypes.c_int(-1), ctypes.c_int(1 << 30))  # M_TRIM_THRESHOLD
    except Exception:
        pass  # non-glibc platform: defaults apply


_tune_malloc()

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "quadscan.c")
_SO = os.path.join(_DIR, "quadscan.so")

AVAILABLE = False
_FN = None
_LK = None
_ACC = None
_PM = None
_PP = None
_CS = None
_CJ = None
_QS = None
_SS = None
_SSM = None
_EX = None
_MD5 = None
_MDW = None
_B2B = None
_CSR = None
_EXM = None


def _compile() -> str | None:
    try:
        if (os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
            return _SO
        tmp = f"{_SO}.tmp.{os.getpid()}"
        # -O3 autovectorizes the elementwise float loops (fastlangid's
        # 73-wide weight-row accumulation is ~90% of its kernel time as
        # scalar adds). -ffp-contract=off forbids FMA contraction so
        # float results stay bit-identical to the numpy fallbacks; -O3
        # never reassociates float reductions without -ffast-math.
        subprocess.run(
            ["cc", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
             _SRC, "-o", tmp, "-lm"],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return _SO
    except Exception:
        return None


def _load() -> None:
    global AVAILABLE, _FN
    so = _compile()
    if so is None:
        return
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return
    fn = lib.quad_octa_scan
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u32bp = np.ctypeslib.ndpointer(np.uint32, ndim=2,
                                   flags="C_CONTIGUOUS")
    # bucket-table argument bundle: buckets, nbuckets, keymask,
    # packed_latn, packed_othr
    _bt = [u32bp, ctypes.c_int64, ctypes.c_uint32, u64p, u64p]
    u8wp0 = np.ctypeslib.ndpointer(np.uint8,
                                   flags="C_CONTIGUOUS,WRITEABLE")
    fn.argtypes = [
        u8p, ctypes.c_int64, i64p, ctypes.c_int64,
        u64p, u64p, ctypes.c_uint64,
        u64p, u64p, ctypes.c_uint64,
        *_bt, *_bt, u8p,
        u64p, i64p, ctypes.POINTER(ctypes.c_int64),
        u64p, i64p, u8wp0, ctypes.POINTER(ctypes.c_int64),
    ]
    fn.restype = ctypes.c_int
    lk = lib.table_lookup_batch
    lk.argtypes = [u64p, u64p, ctypes.c_uint64, u64p, ctypes.c_int64, u64p]
    lk.restype = ctypes.c_int
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    acc = lib.fastlangid_score
    acc.argtypes = [u8p, i64p, ctypes.c_int64, i32p, f32p, ctypes.c_int64,
                    i32p, i32p, f32p, i64p, i64p]
    acc.restype = ctypes.c_int
    u8op = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS,WRITEABLE")
    pm = lib.predict_mask
    pm.argtypes = [u8p, ctypes.c_int64, i64p, u8op, u8op]
    pm.restype = ctypes.c_int64
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    pp = lib.ppl_score
    pp.argtypes = [u8p, i64p, ctypes.c_int64, i64p,
                   u64p, u64p, ctypes.c_uint64,
                   f64p, ctypes.c_int64, f64p, i64p]
    pp.restype = ctypes.c_int
    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    cs = lib.quad_octa_chunk_score
    cs.argtypes = [
        u8p, ctypes.c_int64, i64p, ctypes.c_int64,
        u64p, u64p, ctypes.c_uint64,
        u64p, u64p, ctypes.c_uint64,
        *_bt, *_bt, u8p, u8p,
        ctypes.c_int64, i32p, i8p, ctypes.c_int64,
        i64p, i64p,
        u64p, i64p, u64p, i64p, u8wp0, i64p,
        i16p, i64p, i64p, i64p, i64p,
    ]
    cs.restype = ctypes.c_int64
    csr_ = lib.quad_octa_chunk_score_ranges
    csr_.argtypes = [
        u8p, ctypes.c_int64, i64p, ctypes.c_int64,
        u64p, u64p, ctypes.c_uint64,
        u64p, u64p, ctypes.c_uint64,
        *_bt, *_bt, u8p, u8p,
        ctypes.c_int64, i32p, i8p, ctypes.c_int64,
        i64p, i64p,
        u64p, i64p, u64p, i64p, u8wp0,
        u64p, i64p, u8wp0, i64p,
        i16p, i64p, i64p, i64p, i64p,
        i64p, i64p,
    ]
    csr_.restype = ctypes.c_int64
    global _CSR
    _CSR = csr_
    cj = lib.cjk_chunk_score
    cj.argtypes = [
        u8p, ctypes.c_int64, i64p, ctypes.c_int64, i64p,
        u64p, u64p, ctypes.c_uint64,
        u32bp, ctypes.c_int64, ctypes.c_uint32, u64p,
        ctypes.c_int64, i32p, i8p, ctypes.c_int64,
        i64p, i64p,
        u64p, i64p, u64p, i64p, i64p,
        i16p, i64p, i64p, i64p, i64p,
    ]
    cj.restype = ctypes.c_int64
    global _CJ
    _CJ = cj
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    qs = lib.quality_scan
    qs.argtypes = [u8p, i64p, ctypes.c_int64,
                   u8p, ctypes.c_int64,
                   u32p, ctypes.c_int64,
                   u64p, ctypes.c_int64, i64p]
    qs.restype = ctypes.c_int
    global _QS
    _QS = qs
    u8wp = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS,WRITEABLE")
    u32wp = np.ctypeslib.ndpointer(np.uint32,
                                   flags="C_CONTIGUOUS,WRITEABLE")
    # the two hottest per-PAGE entry points take raw void* pointers:
    # ndpointer.from_param validation costs ~5us/arg/call, which at
    # ~11 array args x 2 calls/page is ~6% of the whole fused kernel
    vp = ctypes.c_void_p
    ss = lib.script_spans_scan
    ss.argtypes = [vp, ctypes.c_int64,
                   vp, vp, ctypes.c_int64,
                   ctypes.c_int64, ctypes.c_int64,
                   vp, vp, vp, vp,
                   vp, vp]
    ss.restype = ctypes.c_int64
    global _SS
    _SS = ss
    ssm = lib.script_spans_scan_multi
    ssm.argtypes = [vp, vp, ctypes.c_int64,
                    vp, vp, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int64,
                    vp, vp, vp, vp,
                    vp, vp, vp]
    ssm.restype = ctypes.c_int64
    global _SSM
    _SSM = ssm
    ex = lib.extract_scan
    ex.argtypes = [vp, ctypes.c_int64,
                   vp, vp, ctypes.c_int64, vp, vp]
    ex.restype = ctypes.c_int64
    global _EX
    _EX = ex
    exm = lib.extract_scan_map
    exm.argtypes = [vp, ctypes.c_int64,
                    vp, vp, ctypes.c_int64, vp, vp, vp]
    exm.restype = ctypes.c_int64
    global _EXM
    _EXM = exm
    m5 = lib.md5_batch
    m5.argtypes = [u8p, i64p, ctypes.c_int64, u8wp]
    m5.restype = ctypes.c_int
    global _MD5
    _MD5 = m5
    mw = lib.md5_windows
    mw.argtypes = [u8p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                   u8wp]
    mw.restype = ctypes.c_int64
    global _MDW
    _MDW = mw
    b2 = lib.blake2b_batch
    b2.argtypes = [u8p, i64p, ctypes.c_int64, ctypes.c_int64, u8wp]
    b2.restype = ctypes.c_int
    global _B2B
    _B2B = b2
    global _LK, _ACC, _PM, _PP, _CS
    _LK = lk
    _ACC = acc
    _PM = pm
    _PP = pp
    _CS = cs
    _FN = fn
    AVAILABLE = True


_load()


# Reusable output scratch (grown to the largest batch seen) — fresh
# n-sized np.empty per call would page-fault gigabytes per actor-hour.
# Ray actors process one batch at a time, so per-process reuse is safe;
# results are copied out before return.
_scratch: dict[str, np.ndarray] = {}


def _prefault(*arrs: np.ndarray) -> None:
    """Touch one element per 4 KB page so the page faults happen at
    allocation time (usually the untimed warm-up), not inside the
    first timed kernel call — measured ~17x first-call slowdown on a
    freshly grown scratch otherwise."""
    for a in arrs:
        a[::max(1, 4096 // a.itemsize)] = 0


def _get_scratch(cap: int):
    if _scratch.get("cap", 0) < cap:
        cap = max(2 * cap, 1 << 16)   # headroom: don't re-fault on
        _scratch["qvals"] = np.empty(cap, dtype=np.uint64)  # +1 batch
        _scratch["qoffs"] = np.empty(cap, dtype=np.int64)
        _scratch["ovals"] = np.empty(cap, dtype=np.uint64)
        _scratch["ooffs"] = np.empty(cap, dtype=np.int64)
        _scratch["odist"] = np.empty(cap, dtype=np.uint8)
        _prefault(_scratch["qvals"], _scratch["qoffs"],
                  _scratch["ovals"], _scratch["ooffs"],
                  _scratch["odist"])
        _scratch["cap"] = cap
    return (_scratch["qvals"], _scratch["qoffs"],
            _scratch["ovals"], _scratch["ooffs"], _scratch["odist"])


def _bt_args(bt):
    """BucketTable -> the 5-arg C bundle."""
    return (bt.buckets, bt.buckets.shape[0], int(bt.keymask),
            bt.packed_latn, bt.packed_othr)


def quad_octa_scan(cat: bytes, bounds: np.ndarray, quad_table,
                   socta, docta, xocta, latin_of_span: np.ndarray):
    """One C pass: quad walk + the GetOctaHits word/pair walk with
    bucket probes. Returns (qvals, qoffs, ovals, ooffs) — table HITS
    only, ascending offsets, bit-equal to hits.quad_hits_dense +
    HashTable.lookup / Detector._octa_stream."""
    n = len(cat)
    buf = np.frombuffer(cat, dtype=np.uint8)
    bounds = np.ascontiguousarray(bounds, dtype=np.int64)
    lat = np.ascontiguousarray(latin_of_span, dtype=np.uint8)
    qvals, qoffs, ovals, ooffs, odist = _get_scratch(2 * n + 8)
    nq = ctypes.c_int64(0)
    no = ctypes.c_int64(0)
    _FN(buf, n, bounds, len(bounds),
        quad_table.keys, quad_table.vals, int(quad_table.mask),
        socta.keys, socta.vals, int(socta.mask),
        *_bt_args(docta), *_bt_args(xocta), lat,
        qvals, qoffs, ctypes.byref(nq),
        ovals, ooffs, odist, ctypes.byref(no))
    return (qvals[:nq.value].copy(), qoffs[:nq.value].copy(),
            ovals[:no.value].copy(), ooffs[:no.value].copy(),
            odist[:no.value].astype(bool))


_cs_scratch: dict[str, np.ndarray] = {}


def _cs_grow(sc: dict, max_span: int, n: int, nb: int, chunk_size: int,
             num_langs: int) -> None:
    """Shared scratch growth for the fused chunk-score kernels
    (2x headroom + page prefault; see _prefault)."""
    # worst case hit count per span: quads ~1/byte; octa stream up to
    # 3 hits (distinct word + delta word + pair) per word, words up to
    # span_bytes/2 -> 1.5x span bytes
    if sc.get("span_cap", 0) < 2 * max_span + 8:
        cap = max(3 * (max_span + 8), 1 << 16)
        sc["qvals"] = np.empty(cap, dtype=np.uint64)
        sc["qoffs"] = np.empty(cap, dtype=np.int64)
        sc["ovals"] = np.empty(cap, dtype=np.uint64)
        sc["ooffs"] = np.empty(cap, dtype=np.int64)
        sc["odist"] = np.empty(cap, dtype=np.uint8)
        _prefault(sc["qvals"], sc["qoffs"], sc["ovals"], sc["ooffs"],
                  sc["odist"])
        sc["span_cap"] = cap
    if sc.get("nl", 0) < num_langs:
        sc["scores"] = np.zeros(num_langs, dtype=np.int64)
        sc["nl"] = num_langs
    out_cap = n // max(chunk_size, 1) + nb + 8
    if sc.get("out_cap", 0) < out_cap:
        out_cap = 2 * out_cap
        sc["lang1"] = np.empty(out_cap, dtype=np.int16)
        sc["cbytes"] = np.empty(out_cap, dtype=np.int64)
        sc["s1"] = np.empty(out_cap, dtype=np.int64)
        sc["rel"] = np.empty(out_cap, dtype=np.int64)
        sc["span"] = np.empty(out_cap, dtype=np.int64)
        _prefault(sc["lang1"], sc["cbytes"], sc["s1"], sc["rel"],
                  sc["span"])
        sc["out_cap"] = out_cap


def quad_octa_chunk_score(cat: bytes, bounds: np.ndarray, quad_table,
                          socta, docta, xocta,
                          latin_of_span: np.ndarray,
                          chunk_size: int,
                          expected_1kb: np.ndarray, close_set: np.ndarray,
                          hint_csr: np.ndarray, hint_flat: np.ndarray,
                          script4_of_span: np.ndarray | None = None):
    """Fused scan + chunk scoring: the whole _many_hits ->
    score_chunks_multi chain in one C pass, per-hit arrays never
    materialized. Returns per-chunk (lang1 i16, cbytes i64, s1 i64,
    rel i64, span_of_chunk i64) — bit-equal to the numpy chain.

    expected_1kb: int32[NUM_LANGS, 4] in the kAvgDeltaOctaScore layout
    (per-span LScript4 slot from ``script4_of_span``; slot 3 when
    omitted); a 1-D array is broadcast across the 4 slots."""
    n = len(cat)
    buf = np.frombuffer(cat, dtype=np.uint8)
    bounds = np.ascontiguousarray(bounds, dtype=np.int64)
    lat = np.ascontiguousarray(latin_of_span, dtype=np.uint8)
    nb = len(bounds)
    max_span = int(np.diff(np.concatenate([[0], bounds])).max(initial=0))
    sc = _cs_scratch
    num_langs = expected_1kb.shape[0]
    _cs_grow(sc, max_span, n, nb, chunk_size, num_langs)
    if expected_1kb.ndim == 1:
        expected_1kb = np.repeat(expected_1kb[:, None], 4, axis=1)
    exp = np.ascontiguousarray(expected_1kb, dtype=np.int32)
    s4 = (np.ascontiguousarray(script4_of_span, dtype=np.uint8)
          if script4_of_span is not None
          else np.full(nb, 3, dtype=np.uint8))
    cset = np.ascontiguousarray(close_set, dtype=np.int8)
    csr = np.ascontiguousarray(hint_csr, dtype=np.int64)
    flat = np.ascontiguousarray(hint_flat, dtype=np.int64)
    if len(flat) == 0:
        flat = np.zeros(1, dtype=np.int64)
    nch = _CS(buf, n, bounds, nb,
              quad_table.keys, quad_table.vals, int(quad_table.mask),
              socta.keys, socta.vals, int(socta.mask),
              *_bt_args(docta), *_bt_args(xocta), lat, s4,
              chunk_size, exp, cset, num_langs,
              csr, flat,
              sc["qvals"], sc["qoffs"], sc["ovals"], sc["ooffs"],
              sc["odist"],
              sc["scores"],
              sc["lang1"], sc["cbytes"], sc["s1"], sc["rel"], sc["span"])
    return (sc["lang1"][:nch].copy(), sc["cbytes"][:nch].copy(),
            sc["s1"][:nch].copy(), sc["rel"][:nch].copy(),
            sc["span"][:nch].copy())


def quad_octa_chunk_score_ranges(cat: bytes, bounds: np.ndarray,
                                 quad_table, socta, docta, xocta,
                                 latin_of_span: np.ndarray,
                                 chunk_size: int,
                                 expected_1kb: np.ndarray,
                                 close_set: np.ndarray,
                                 hint_csr: np.ndarray,
                                 hint_flat: np.ndarray,
                                 script4_of_span: np.ndarray
                                 | None = None):
    """quad_octa_chunk_score PLUS the per-chunk ranges outputs:
    (lang1, cbytes, s1, rel, span_of_chunk, rel_delta, cstart) where
    rel_delta is the zeros-expected reliability (the detect_ranges
    un-gate) and cstart the BetterBoundary-sharpened chunk start in
    span-LOCAL bytes. The first five outputs are bit-equal to
    quad_octa_chunk_score (same scan, same chunk scorer)."""
    n = len(cat)
    buf = np.frombuffer(cat, dtype=np.uint8)
    bounds = np.ascontiguousarray(bounds, dtype=np.int64)
    lat = np.ascontiguousarray(latin_of_span, dtype=np.uint8)
    nb = len(bounds)
    max_span = int(np.diff(np.concatenate([[0], bounds])).max(initial=0))
    sc = _cs_scratch
    num_langs = expected_1kb.shape[0]
    _cs_grow(sc, max_span, n, nb, chunk_size, num_langs)
    if sc.get("m_cap", 0) < sc["span_cap"]:
        mcap = sc["span_cap"]
        sc["mvals"] = np.empty(mcap, dtype=np.uint64)
        sc["moffs"] = np.empty(mcap, dtype=np.int64)
        sc["mdist"] = np.empty(mcap, dtype=np.uint8)
        _prefault(sc["mvals"], sc["moffs"], sc["mdist"])
        sc["m_cap"] = mcap
    if sc.get("r_cap", 0) < sc["out_cap"]:
        rcap = sc["out_cap"]
        sc["rel_delta"] = np.empty(rcap, dtype=np.int64)
        sc["cstart"] = np.empty(rcap, dtype=np.int64)
        _prefault(sc["rel_delta"], sc["cstart"])
        sc["r_cap"] = rcap
    if expected_1kb.ndim == 1:
        expected_1kb = np.repeat(expected_1kb[:, None], 4, axis=1)
    exp = np.ascontiguousarray(expected_1kb, dtype=np.int32)
    s4 = (np.ascontiguousarray(script4_of_span, dtype=np.uint8)
          if script4_of_span is not None
          else np.full(nb, 3, dtype=np.uint8))
    cset = np.ascontiguousarray(close_set, dtype=np.int8)
    csr = np.ascontiguousarray(hint_csr, dtype=np.int64)
    flat = np.ascontiguousarray(hint_flat, dtype=np.int64)
    if len(flat) == 0:
        flat = np.zeros(1, dtype=np.int64)
    nch = _CSR(buf, n, bounds, nb,
               quad_table.keys, quad_table.vals, int(quad_table.mask),
               socta.keys, socta.vals, int(socta.mask),
               *_bt_args(docta), *_bt_args(xocta), lat, s4,
               chunk_size, exp, cset, num_langs,
               csr, flat,
               sc["qvals"], sc["qoffs"], sc["ovals"], sc["ooffs"],
               sc["odist"],
               sc["mvals"], sc["moffs"], sc["mdist"],
               sc["scores"],
               sc["lang1"], sc["cbytes"], sc["s1"], sc["rel"],
               sc["span"], sc["rel_delta"], sc["cstart"])
    return (sc["lang1"][:nch].copy(), sc["cbytes"][:nch].copy(),
            sc["s1"][:nch].copy(), sc["rel"][:nch].copy(),
            sc["span"][:nch].copy(), sc["rel_delta"][:nch].copy(),
            sc["cstart"][:nch].copy())


def cjk_chunk_score(cat: bytes, bounds: np.ndarray,
                    pseudo_lens: np.ndarray, uni_table, cjkbi,
                    chunk_size: int, expected_1kb: np.ndarray,
                    close_set: np.ndarray, hint_csr: np.ndarray,
                    hint_flat: np.ndarray):
    """Fused CJK uni+bi scan + chunk scoring (the cjk_candidates ->
    lookup -> score_chunks_multi chain) in one C pass. bounds are END
    byte offsets into cat; pseudo_lens are the per-span text_bytes used
    for chunk extents (char positions scale x3, as in the numpy path).
    cjkbi is a BucketTable probed with BiHashV2 (othr decode)."""
    n = len(cat)
    buf = np.frombuffer(cat, dtype=np.uint8)
    bounds = np.ascontiguousarray(bounds, dtype=np.int64)
    plens = np.ascontiguousarray(pseudo_lens, dtype=np.int64)
    nb = len(bounds)
    max_span = int(np.diff(np.concatenate([[0], bounds])).max(initial=0))
    sc = _cs_scratch
    _cs_grow(sc, max_span, n, nb, chunk_size, len(expected_1kb))
    exp = np.ascontiguousarray(expected_1kb, dtype=np.int32)
    cset = np.ascontiguousarray(close_set, dtype=np.int8)
    csr = np.ascontiguousarray(hint_csr, dtype=np.int64)
    flat = np.ascontiguousarray(hint_flat, dtype=np.int64)
    if len(flat) == 0:
        flat = np.zeros(1, dtype=np.int64)
    nch = _CJ(buf, n, bounds, nb, plens,
              uni_table.keys, uni_table.vals, int(uni_table.mask),
              cjkbi.buckets, cjkbi.buckets.shape[0], int(cjkbi.keymask),
              cjkbi.packed_othr,
              chunk_size, exp, cset, len(exp),
              csr, flat,
              sc["qvals"], sc["qoffs"], sc["ovals"], sc["ooffs"],
              sc["scores"],
              sc["lang1"], sc["cbytes"], sc["s1"], sc["rel"], sc["span"])
    return (sc["lang1"][:nch].copy(), sc["cbytes"][:nch].copy(),
            sc["s1"][:nch].copy(), sc["rel"][:nch].copy(),
            sc["span"][:nch].copy())


_ex_scratch: dict[str, np.ndarray] = {}


def extract_scan(html: bytes, ent_keys: np.ndarray, ent_vals: np.ndarray,
                 low_map: np.ndarray) -> bytes:
    """One C pass of extract_text's tag-skip / ws-compress / entity
    chain over \\r-normalized valid-UTF-8 html. Returns the extracted
    utf-8 bytes (bit-equal to the Python path — tested)."""
    n = len(html)
    sc = _ex_scratch
    if sc.get("cap", 0) < n + 8:
        cap = max(2 * (n + 8), 1 << 16)
        sc["out"] = np.empty(cap, dtype=np.uint8)
        _prefault(sc["out"])
        sc["out_ptr"] = sc["out"].ctypes.data
        sc["cap"] = cap
    # bytes objects pass as raw const pointers; arrays by .ctypes.data
    # (argtypes are c_void_p - no per-call ndpointer validation)
    m = _EX(html, n, ent_keys.ctypes.data, ent_vals.ctypes.data,
            len(ent_keys), low_map.ctypes.data, sc["out_ptr"])
    return sc["out"][:m].tobytes()


def extract_scan_map(html: bytes, ent_keys: np.ndarray,
                     ent_vals: np.ndarray,
                     low_map: np.ndarray) -> tuple[bytes, np.ndarray]:
    """extract_scan on RAW (un-normalized) page bytes, additionally
    returning src_of[k] = raw position that produced output byte k —
    the chunks path's offset map (one array index per mapped
    position). Text is byte-identical to extract_text (tested)."""
    n = len(html)
    sc = _ex_scratch
    if sc.get("mcap", 0) < n + 8:
        mcap = max(2 * (n + 8), 1 << 16)
        sc["mout"] = np.empty(mcap, dtype=np.uint8)
        sc["msrc"] = np.empty(mcap, dtype=np.int64)
        _prefault(sc["mout"], sc["msrc"])
        sc["mout_ptr"] = sc["mout"].ctypes.data
        sc["msrc_ptr"] = sc["msrc"].ctypes.data
        sc["mcap"] = mcap
    m = _EXM(html, n, ent_keys.ctypes.data, ent_vals.ctypes.data,
             len(ent_keys), low_map.ctypes.data, sc["mout_ptr"],
             sc["msrc_ptr"])
    return sc["mout"][:m].tobytes(), sc["msrc"][:m].copy()


_ss_scratch: dict[str, np.ndarray] = {}


def script_spans_scan(utf8_text: bytes, script_lut: np.ndarray,
                      lower_lut: np.ndarray, text_limit: int,
                      max_span_bytes: int):
    """One C pass for script-run segmentation (spans.script_spans
    semantics, bit-equal — tested). Returns (meta int64[nspans, 7],
    out_buf uint8 view, lt_idx int64 view); meta rows are
    [script, char_off, char_end, out_start, out_bytes, lp_start,
    lp_end] with lp_* indexing lt_idx."""
    n = len(utf8_text)
    sc = _ss_scratch
    if sc.get("cap", 0) < n + 8:
        cap = max(2 * (n + 8), 1 << 16)
        sc["lt_idx"] = np.empty(cap, dtype=np.int64)
        sc["lt_sc"] = np.empty(cap, dtype=np.uint8)
        sc["lt_low"] = np.empty(cap, dtype=np.uint32)
        sc["lt_len"] = np.empty(cap, dtype=np.uint8)
        sc["out_buf"] = np.empty(8 * cap + 64, dtype=np.uint8)
        sc["meta"] = np.empty((cap + 8) * 7, dtype=np.int64)
        _prefault(sc["lt_idx"], sc["lt_sc"], sc["lt_low"], sc["lt_len"],
                  sc["out_buf"])
        sc["ptrs"] = tuple(sc[k].ctypes.data for k in
                           ("lt_idx", "lt_sc", "lt_low", "lt_len",
                            "out_buf", "meta"))
        sc["cap"] = cap
    # bytes objects pass as raw const pointers; arrays by .ctypes.data
    # (argtypes are c_void_p - no per-call ndpointer validation)
    ns = _SS(utf8_text, n, script_lut.ctypes.data, lower_lut.ctypes.data,
             len(script_lut), text_limit, max_span_bytes, *sc["ptrs"])
    meta = sc["meta"][:ns * 7].reshape(ns, 7)
    return meta, sc["out_buf"], sc["lt_idx"]


_ssm_scratch: dict[str, np.ndarray] = {}


def script_spans_scan_multi(cat: bytes, bounds: np.ndarray,
                            script_lut: np.ndarray, lower_lut: np.ndarray,
                            text_limit: int, max_span_bytes: int):
    """Batched script_spans_scan: one C call for all docs. ``bounds``
    are cumulative end offsets into ``cat``. Returns (meta, ns_doc,
    out_buf view, lt_idx view); meta rows as in script_spans_scan with
    out/lp indexes already rebased to the shared buffers; doc d owns
    meta rows [sum(ns_doc[:d]), sum(ns_doc[:d+1]))."""
    n = len(cat)
    n_docs = len(bounds)
    sc = _ssm_scratch
    lt_need = n + 8 * n_docs + 8
    if sc.get("lt_cap", 0) < lt_need or sc.get("nd_cap", 0) < n_docs:
        # 2x headroom so slightly-larger later batches don't re-fault,
        # and pre-touch the densely-written arrays once here: first
        # touch of fresh pages costs ~85us/KB-doc vs ~5us warm, and
        # this allocation path runs during the (untimed) warm-up
        lt_cap = max(2 * lt_need, 1 << 16)
        nd_cap = max(2 * n_docs, 256)
        sc["lt_idx"] = np.zeros(lt_cap, dtype=np.int64)
        sc["lt_sc"] = np.zeros(lt_cap, dtype=np.uint8)
        sc["lt_low"] = np.zeros(lt_cap, dtype=np.uint32)
        sc["lt_len"] = np.zeros(lt_cap, dtype=np.uint8)
        sc["out_buf"] = np.zeros(8 * lt_cap + 64, dtype=np.uint8)
        # meta stays untouched-lazy: its worst-case sizing is huge but
        # only emitted span rows are ever written
        sc["meta"] = np.empty((lt_cap + 8) * 7, dtype=np.int64)
        sc["ns_doc"] = np.zeros(nd_cap, dtype=np.int64)
        _prefault(sc["lt_idx"], sc["lt_sc"], sc["lt_low"], sc["lt_len"],
                  sc["out_buf"])
        sc["ptrs"] = tuple(sc[k].ctypes.data for k in
                           ("lt_idx", "lt_sc", "lt_low", "lt_len",
                            "out_buf", "meta", "ns_doc"))
        sc["lt_cap"] = lt_cap
        sc["nd_cap"] = nd_cap
    ns = _SSM(cat, bounds.ctypes.data, n_docs,
              script_lut.ctypes.data, lower_lut.ctypes.data,
              len(script_lut), text_limit, max_span_bytes, *sc["ptrs"])
    meta = sc["meta"][:ns * 7].reshape(ns, 7)
    return meta, sc["ns_doc"][:n_docs], sc["out_buf"], sc["lt_idx"]


def quality_scan(cat: bytes, bounds: np.ndarray, letter_lut: np.ndarray,
                 fold_lut: np.ndarray, sw_table: np.ndarray) -> np.ndarray:
    """One C pass over concatenated STRIPPED utf-8 docs -> (n_docs, 13)
    int64 stats [n_words, n_chars, n_ws, alpha_words, n_stop,
    n_sentences, symbols, has_lorem, has_brace, n_lines(non-empty),
    bullet_lines, ellipsis_lines, dup_lines] with RE2/pandas-pinned
    semantics (see quadscan.c quality_scan / line_scan_doc)."""
    n_docs = len(bounds)
    buf = np.frombuffer(cat, dtype=np.uint8)
    bounds = np.ascontiguousarray(bounds, dtype=np.int64)
    out = np.zeros((n_docs, 13), dtype=np.int64)
    _QS(buf, bounds, n_docs, letter_lut, len(letter_lut),
        fold_lut, len(fold_lut), sw_table, len(sw_table), out)
    return out


def table_lookup(keys: np.ndarray, vals: np.ndarray, mask: int,
                 queries: np.ndarray) -> np.ndarray:
    """C probe loop for HashTable.lookup (bit-equal to the numpy path)."""
    q = np.ascontiguousarray(queries, dtype=np.uint64)
    out = np.empty(len(q), dtype=np.uint64)
    _LK(keys, vals, int(mask), q, len(q), out)
    return out


_fl_scratch: dict[str, np.ndarray] = {}


def ppl_score(cat: bytes, bounds: np.ndarray, lang_ids: np.ndarray,
              table, uni: np.ndarray):
    """Per-doc char-trigram LM bits over concatenated framed lowered
    docs. Returns (bits float64[n], n_trigrams int64[n])."""
    n_docs = len(bounds)
    buf = np.frombuffer(cat, dtype=np.uint8)
    bounds = np.ascontiguousarray(bounds, dtype=np.int64)
    lang_ids = np.ascontiguousarray(lang_ids, dtype=np.int64)
    uni = np.ascontiguousarray(uni, dtype=np.float64)
    bits = np.zeros(n_docs, dtype=np.float64)
    cnt = np.zeros(n_docs, dtype=np.int64)
    _PP(buf, bounds, n_docs, lang_ids, table.keys, table.vals,
        int(table.mask), uni, uni.shape[1], bits, cnt)
    return bits, cnt


_pm_tbl = None


def predict_mask(data: bytes):
    """(mask bool[nchars], nbytes uint8[nchars]) for the 12-bit
    next-char predictor, one C pass over the UTF-8 bytes."""
    global _pm_tbl
    if _pm_tbl is None:
        _pm_tbl = np.empty(4096, dtype=np.int64)
    _pm_tbl.fill(-1)
    buf = np.frombuffer(data, dtype=np.uint8)
    mask = np.empty(len(data) + 1, dtype=np.uint8)
    nb = np.empty(len(data) + 1, dtype=np.uint8)
    nc = _PM(buf, len(buf), _pm_tbl, mask, nb)
    return mask[:nc].astype(bool), nb[:nc]


def fastlangid_score(cat: bytes, bounds: np.ndarray, idx: np.ndarray,
                     w: np.ndarray):
    """Fused hashed-n-gram classifier scoring over concatenated framed
    docs. Returns (scores (n,k) f32, nfeats int64[n], nrows int64[n])."""
    n_docs = len(bounds)
    buf = np.frombuffer(cat, dtype=np.uint8)
    bounds = np.ascontiguousarray(bounds, dtype=np.int64)
    if _fl_scratch.get("n_rows", 0) < w.shape[0]:
        _fl_scratch["cnt"] = np.zeros(w.shape[0], dtype=np.int32)
        _fl_scratch["n_rows"] = w.shape[0]
    max_doc = int(np.diff(np.concatenate([[0], bounds])).max(initial=0))
    if _fl_scratch.get("t_cap", 0) < 3 * max_doc + 8:
        _fl_scratch["touched"] = np.empty(3 * max_doc + 8, dtype=np.int32)
        _fl_scratch["t_cap"] = 3 * max_doc + 8
    scores = np.zeros((n_docs, w.shape[1]), dtype=np.float32)
    nfeats = np.zeros(n_docs, dtype=np.int64)
    nrows = np.zeros(n_docs, dtype=np.int64)
    _ACC(buf, bounds, n_docs, idx, w, w.shape[1],
         _fl_scratch["cnt"], _fl_scratch["touched"], scores, nfeats, nrows)
    return scores, nfeats, nrows


# ---- batched hash kernels (dedup / sampling pipelines) -----------------

_HEXLUT = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def utf8_cat(strings):
    """(data uint8[], offsets int64[n+1]) for a sequence of strings —
    the concatenated-buffer form every hash kernel takes. Accepts a
    list/ndarray/Series of str (None -> empty) or a pyarrow
    String/LargeString array (zero-copy when offsets are int64)."""
    import pyarrow as _pa
    if isinstance(strings, _pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, _pa.Array):
        strings = _pa.array(
            [s if isinstance(s, str) else "" for s in strings],
            type=_pa.large_string())
    elif strings.null_count:
        strings = strings.fill_null("")
    if _pa.types.is_string(strings.type):
        strings = strings.cast(_pa.large_string())
    bufs = strings.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64,
                        count=len(strings) + 1 + strings.offset)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] else \
        np.empty(0, dtype=np.uint8)
    if strings.offset:
        off = off[strings.offset:]
    if off[0]:
        # sliced array: rebase offsets onto a compact copy
        data = np.ascontiguousarray(data[off[0]:off[-1]])
        off = off - off[0]
    return data, np.ascontiguousarray(off)


def md5_batch(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(n, 16) uint8 MD5 digests of data[offsets[i]:offsets[i+1]]."""
    n = len(offsets) - 1
    out = np.empty((n, 16), dtype=np.uint8)
    if n:
        _MD5(np.ascontiguousarray(data, dtype=np.uint8),
             np.ascontiguousarray(offsets, dtype=np.int64), n, out)
    return out


def md5_windows(word_data: np.ndarray, word_offsets: np.ndarray,
                doc_bounds: np.ndarray, window: int) -> np.ndarray:
    """(n_windows, 16) uint8 MD5 digests of every stride-1
    ``window``-token space-joined window, doc-major (docs shorter
    than ``window`` emit nothing) — the substring_dedup md5 keys."""
    doc_bounds = np.ascontiguousarray(doc_bounds, dtype=np.int64)
    nw_doc = np.diff(np.concatenate([[0], doc_bounds]))
    total = int(np.maximum(nw_doc - window + 1, 0).sum())
    out = np.empty((total, 16), dtype=np.uint8)
    if total:
        n = _MDW(np.ascontiguousarray(word_data, dtype=np.uint8),
                 np.ascontiguousarray(word_offsets, dtype=np.int64),
                 doc_bounds, len(doc_bounds), window, out)
        assert n == total
    return out


def blake2b_batch(data: np.ndarray, offsets: np.ndarray,
                  digest_size: int = 16) -> np.ndarray:
    """(n, digest_size) uint8 keyless BLAKE2b digests."""
    n = len(offsets) - 1
    out = np.empty((n, digest_size), dtype=np.uint8)
    if n:
        _B2B(np.ascontiguousarray(data, dtype=np.uint8),
             np.ascontiguousarray(offsets, dtype=np.int64), n,
             digest_size, out)
    return out


def hex_digest(dig: np.ndarray) -> np.ndarray:
    """(n, k) uint8 digests -> numpy 'S2k' lowercase-hex bytes rows
    (hashlib.hexdigest parity; decode/astype(object) for str)."""
    n, k = dig.shape
    out = np.empty((n, 2 * k), dtype=np.uint8)
    out[:, 0::2] = _HEXLUT[dig >> 4]
    out[:, 1::2] = _HEXLUT[dig & 15]
    return out.reshape(-1).view(f"S{2 * k}")


def hex_digest_arrow(dig: np.ndarray):
    """(n, k) uint8 digests -> pyarrow string array of lowercase hex
    (zero Python-object churn: offsets + data buffers built directly)."""
    import pyarrow as _pa
    n, k = dig.shape
    hx = np.asarray(hex_digest(dig)).view(np.uint8).reshape(n, 2 * k)
    offs = np.arange(0, 2 * k * (n + 1), 2 * k, dtype=np.int32)
    return _pa.Array.from_buffers(
        _pa.utf8(), n,
        [None, _pa.py_buffer(offs.tobytes()),
         _pa.py_buffer(np.ascontiguousarray(hx).tobytes())])
