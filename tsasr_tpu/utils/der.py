"""Diarization Error Rate, natively (no Perl).

The reference shells out to NIST's ``md-eval.pl``
(``utils/DER.py:38-152``); this module re-implements the same scoring in
numpy: missed speech (MS), false alarm (FA), speaker error (SER) and
their sum (DER), as percentages of scored speaker time, with

- a forgiveness **collar** excluding +/-collar around every reference
  segment boundary,
- optional **ignore_overlap** (score only where <=1 reference speaker),
- the optimal 1-1 reference<->system speaker mapping (Hungarian
  assignment on overlap time, md-eval's strategy).

Input RTTM conventions follow ``processing/diarization.py``'s
``read_rttm``/``write_rttm`` (SPEAKER lines: onset + duration).
"""

import numpy as np


def load_rttm(path):
    """RTTM file -> {rec_id: [(speaker, onset, offset), ...]}."""
    by_file = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] != "SPEAKER":
                continue
            rec, onset, dur, spk = (parts[1], float(parts[3]),
                                    float(parts[4]), parts[7])
            by_file.setdefault(rec, []).append((spk, onset, onset + dur))
    return by_file


def _scored_regions(ref_turns, collar, ignore_overlap, extent):
    """List of (start, end) intervals that are scored: the full extent
    minus the collar zones around reference boundaries (and minus
    ref-overlap regions when ignore_overlap)."""
    points = {extent[0], extent[1]}
    for _, s, e in ref_turns:
        points.update((s - collar, s + collar, e - collar, e + collar,
                       s, e))
    cuts = sorted(p for p in points if extent[0] < p < extent[1])
    edges = [extent[0]] + cuts + [extent[1]]
    regions = []
    for a, b in zip(edges[:-1], edges[1:]):
        if b - a <= 0:
            continue
        mid = 0.5 * (a + b)
        in_collar = any(
            (s - collar) < mid < (s + collar) or
            (e - collar) < mid < (e + collar)
            for _, s, e in ref_turns)
        if in_collar:
            continue
        if ignore_overlap:
            n_ref = sum(1 for _, s, e in ref_turns if s < mid < e)
            if n_ref > 1:
                continue
        regions.append((a, b))
    return regions


def _clip_turns(turns, regions):
    """Intersect speaker turns with scored regions ->
    {speaker: total time} and a list of clipped (spk, s, e)."""
    clipped = []
    for spk, s, e in turns:
        for a, b in regions:
            lo, hi = max(s, a), min(e, b)
            if hi > lo:
                clipped.append((spk, lo, hi))
    return clipped


def _score_file(ref_turns, sys_turns, collar=0.25, ignore_overlap=False):
    """-> dict(scored, miss, fa, spkerr) times (seconds) for one file."""
    if not ref_turns and not sys_turns:
        return {"scored": 0.0, "miss": 0.0, "fa": 0.0, "spkerr": 0.0}
    all_turns = ref_turns + sys_turns
    extent = (min(s for _, s, _ in all_turns) - 2 * collar,
              max(e for _, _, e in all_turns) + 2 * collar)
    regions = _scored_regions(ref_turns, collar, ignore_overlap, extent)
    ref_c = _clip_turns(ref_turns, regions)
    sys_c = _clip_turns(sys_turns, regions)

    # optimal ref<->sys speaker mapping by overlap time (Hungarian)
    ref_spk = sorted({spk for spk, _, _ in ref_c})
    sys_spk = sorted({spk for spk, _, _ in sys_c})
    overlap = np.zeros((len(ref_spk), len(sys_spk)))
    for i, r in enumerate(ref_spk):
        for j, y in enumerate(sys_spk):
            t = 0.0
            for spk_r, s1, e1 in ref_c:
                if spk_r != r:
                    continue
                for spk_s, s2, e2 in sys_c:
                    if spk_s != y:
                        continue
                    t += max(0.0, min(e1, e2) - max(s1, s2))
            overlap[i, j] = t
    mapping = {}
    if overlap.size:
        from scipy.optimize import linear_sum_assignment
        rows, cols = linear_sum_assignment(-overlap)
        mapping = {ref_spk[i]: sys_spk[j] for i, j in zip(rows, cols)
                   if overlap[i, j] > 0}

    # elementary intervals over the scored timeline
    points = sorted({p for _, s, e in ref_c + sys_c for p in (s, e)})
    scored = miss = fa = spkerr = 0.0
    for a, b in zip(points[:-1], points[1:]):
        dur = b - a
        if dur <= 0:
            continue
        mid = 0.5 * (a + b)
        ref_here = {spk for spk, s, e in ref_c if s < mid < e
                    or (s <= a and b <= e)}
        sys_here = {spk for spk, s, e in sys_c if s < mid < e
                    or (s <= a and b <= e)}
        n_ref, n_sys = len(ref_here), len(sys_here)
        n_correct = sum(1 for r in ref_here
                        if mapping.get(r) in sys_here)
        scored += dur * n_ref
        miss += dur * max(0, n_ref - n_sys)
        fa += dur * max(0, n_sys - n_ref)
        spkerr += dur * (min(n_ref, n_sys) - n_correct)
    return {"scored": scored, "miss": miss, "fa": fa, "spkerr": spkerr}


def _rectify(arr):
    """0/0 -> 0, x/0 -> 1, then percent (reference ``rectify``)."""
    arr = np.asarray(arr, float)
    arr[np.isnan(arr)] = 0.0
    arr[np.isinf(arr)] = 1.0
    return arr * 100.0


def DER(ref_rttm, sys_rttm, ignore_overlap=False, collar=0.25,
        individual_file_scores=False):
    """Score a system RTTM against a reference RTTM.

    Same signature/return as the reference wrapper (``utils/DER.py:38``):
    arrays of (MS, FA, SER, DER) percentages per file with the ALL-files
    aggregate appended last; with ``individual_file_scores=False`` only
    the aggregate scalars are returned.
    """
    ref_by_file = load_rttm(ref_rttm)
    sys_by_file = load_rttm(sys_rttm)
    file_ids = sorted(set(ref_by_file) | set(sys_by_file))
    scored_t, miss_t, fa_t, err_t = [], [], [], []
    for fid in file_ids:
        r = _score_file(ref_by_file.get(fid, []),
                        sys_by_file.get(fid, []),
                        collar=collar, ignore_overlap=ignore_overlap)
        scored_t.append(r["scored"])
        miss_t.append(r["miss"])
        fa_t.append(r["fa"])
        err_t.append(r["spkerr"])
    # aggregate (md-eval's ALL row) appended last
    scored_t.append(sum(scored_t))
    miss_t.append(sum(miss_t))
    fa_t.append(sum(fa_t))
    err_t.append(sum(err_t))
    scored = np.asarray(scored_t)
    miss = np.asarray(miss_t)
    fa = np.asarray(fa_t)
    err = np.asarray(err_t)
    with np.errstate(invalid="ignore", divide="ignore"):
        ms = _rectify(miss / scored)
        fas = _rectify(fa / scored)
        sers = _rectify(err / scored)
        ders = _rectify((miss + fa + err) / scored)
    if individual_file_scores:
        return ms, fas, sers, ders
    return ms[-1], fas[-1], sers[-1], ders[-1]
