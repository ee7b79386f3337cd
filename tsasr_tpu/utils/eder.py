"""Emotion Diarization Error Rate (EDER).

Re-implementation of the reference metric (``utils/EDER.py:1-276``):
frame-wise emotion predictions are merged into segments, overlaps split
evenly, and scored against a (single-emotion) reference annotation as
``1 - correctly_attributed_time / duration``.
"""


def overlap_length(a, b):
    """Overlapped length of two [start, end] intervals."""
    return max(0.0, min(a[1], b[1]) - max(a[0], b[0]))


def merge_adjacent_same_label(segs):
    """Merge touching/overlapping segments with the same label.

    ``segs``: list of ``[rec_id, start, end, label]`` in time order.
    """
    if not segs:
        return []
    merged = [list(segs[0])]
    for seg in segs[1:]:
        last = merged[-1]
        if seg[1] <= last[2] and seg[3] == last[3]:
            last[2] = max(last[2], seg[2])
        else:
            merged.append(list(seg))
    return merged


def split_overlaps_evenly(segs):
    """Give half of each overlap between label-differing neighbours to
    each side (reference ``distribute_overlap``)."""
    if not segs:
        return []
    out = [list(segs[0])]
    for seg in segs[1:]:
        seg = list(seg)
        last = out[-1]
        if seg[1] < last[2]:
            half = 0.5 * (last[2] - seg[1])
            last[2] -= half
            seg[1] += half
        out.append(seg)
    return out


def reference_segments(rec_id, duration, emotion, neutral="n"):
    """Annotation dicts -> full-timeline ``[rec_id, s, e, label]`` list
    with neutral filler outside the annotated emotion (reference
    ``reference_to_lol``; single-emotion utterances, like the
    reference)."""
    if len(emotion) != 1:
        raise NotImplementedError(
            "only single-emotion utterances are supported")
    start, end = emotion[0]["start"], emotion[0]["end"]
    duration = float(duration)
    segs = []
    if start > 0:
        segs.append([rec_id, 0.0, start, neutral])
    segs.append([rec_id, start, end, emotion[0]["emo"][0]])
    if end < duration:
        segs.append([rec_id, end, duration, neutral])
    return segs


def EDER(prediction, id, duration, emotion, window_length, stride):
    """Frame-wise predictions -> EDER for one utterance.

    ``prediction``: per-frame labels (e.g. ``['n','n','a','a']``);
    frames are ``stride`` apart and ``window_length`` long, so adjacent
    windows overlap by ``window_length - stride`` (split evenly after
    same-label merging). Pinned against the reference doctest
    (``utils/EDER.py:24-34``).
    """
    duration = float(duration)
    segs = [[id, stride * i, stride * i + window_length, label]
            for i, label in enumerate(prediction)]
    segs = merge_adjacent_same_label(segs)
    if len(segs) > 1:
        segs = split_overlaps_evenly(segs)
    ref = reference_segments(id, duration, emotion)

    good = 0.0
    for _, rs, re_, rlabel in ref:
        for _, ss, se, slabel in segs:
            if slabel == rlabel:
                good += overlap_length([rs, re_], [ss, se])
    return 1.0 - good / duration
