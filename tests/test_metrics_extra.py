"""DER / EDER / BLEU metrics — value-pinned on hand-computed inputs.

Reference counterparts: ``utils/DER.py`` (md-eval.pl wrapper — here a
native numpy scorer), ``utils/EDER.py`` (doctest value pinned),
``utils/bleu.py`` (sacrebleu wrapper — here native corpus BLEU).
"""

import io
import math
import os

import numpy as np
import pytest

from tsasr_tpu.utils.bleu import BLEUStats, corpus_bleu
from tsasr_tpu.utils.der import DER, _score_file
from tsasr_tpu.utils.eder import EDER


class TestDER:
    def test_perfect_match(self):
        ref = [("A", 0.0, 5.0), ("B", 5.0, 10.0)]
        r = _score_file(ref, ref, collar=0.0)
        assert r["miss"] == r["fa"] == r["spkerr"] == 0.0
        assert r["scored"] == pytest.approx(10.0)

    def test_hand_computed_missed_and_fa(self):
        """ref: A speaks 0-10. sys: A speaks 0-8 -> 2 s missed.
        sys extra speaker B 10-12 -> 2 s false alarm. collar 0."""
        ref = [("A", 0.0, 10.0)]
        sys = [("A", 0.0, 8.0), ("B", 10.0, 12.0)]
        r = _score_file(ref, sys, collar=0.0)
        assert r["scored"] == pytest.approx(10.0)
        assert r["miss"] == pytest.approx(2.0)
        assert r["fa"] == pytest.approx(2.0)
        assert r["spkerr"] == pytest.approx(0.0)

    def test_speaker_confusion_with_mapping(self):
        """ref: A 0-6, B 6-10. sys labels swapped names entirely
        (X covers 0-6, Y covers 6-10): optimal mapping makes DER 0.
        But if sys X covers 0-8 and Y 8-10, 2 s of B's speech are
        attributed to the wrong (mapped) speaker -> spkerr 2."""
        ref = [("A", 0.0, 6.0), ("B", 6.0, 10.0)]
        sys_good = [("X", 0.0, 6.0), ("Y", 6.0, 10.0)]
        r = _score_file(ref, sys_good, collar=0.0)
        assert r["miss"] == r["fa"] == r["spkerr"] == 0.0

        sys_shift = [("X", 0.0, 8.0), ("Y", 8.0, 10.0)]
        r = _score_file(ref, sys_shift, collar=0.0)
        assert r["spkerr"] == pytest.approx(2.0)
        assert r["miss"] == pytest.approx(0.0)
        assert r["fa"] == pytest.approx(0.0)

    def test_collar_forgives_boundary_jitter(self):
        """0.25 s collar: a 0.2 s boundary error is not scored."""
        ref = [("A", 0.0, 5.0), ("B", 5.0, 10.0)]
        sys = [("A", 0.0, 5.2), ("B", 5.2, 10.0)]
        r = _score_file(ref, sys, collar=0.25)
        assert r["spkerr"] == pytest.approx(0.0)
        assert r["miss"] == pytest.approx(0.0)
        # and without the collar it IS scored
        r0 = _score_file(ref, sys, collar=0.0)
        assert r0["spkerr"] == pytest.approx(0.2, abs=1e-9)

    def test_ignore_overlap(self):
        """A 0-10 and B 5-10 overlap in 5-10; with ignore_overlap only
        0-5 is scored (sys missing B there costs nothing)."""
        ref = [("A", 0.0, 10.0), ("B", 5.0, 10.0)]
        sys = [("A", 0.0, 10.0)]
        r = _score_file(ref, sys, collar=0.0, ignore_overlap=True)
        assert r["scored"] == pytest.approx(5.0)
        assert r["miss"] == pytest.approx(0.0)
        r2 = _score_file(ref, sys, collar=0.0, ignore_overlap=False)
        assert r2["miss"] == pytest.approx(5.0)

    def test_rttm_file_api(self, tmp_path):
        """End-to-end through RTTM files, wired to the diarization
        module's writer (processing/diarization.py)."""
        from tsasr_tpu.processing.diarization import write_rttm
        ref_p = os.path.join(tmp_path, "ref.rttm")
        sys_p = os.path.join(tmp_path, "sys.rttm")
        write_rttm([("rec1", 0.0, 10.0, "A")], ref_p)
        write_rttm([("rec1", 0.0, 8.0, "spk0")], sys_p)
        ms, fa, ser, der = DER(ref_p, sys_p, collar=0.0)
        assert ms == pytest.approx(20.0)
        assert fa == pytest.approx(0.0)
        assert der == pytest.approx(20.0)
        # individual_file_scores: per-file rows + aggregate last
        ms_a, fa_a, ser_a, der_a = DER(ref_p, sys_p, collar=0.0,
                                       individual_file_scores=True)
        assert len(der_a) == 2 and der_a[0] == pytest.approx(der_a[1])


class TestEDER:
    def test_reference_doctest_value(self):
        # utils/EDER.py:24-34
        got = EDER(prediction=["n", "n", "n", "a", "a", "a"],
                   id="spk1_1", duration=1.22,
                   emotion=[{"emo": "angry", "start": 0.39, "end": 1.10}],
                   window_length=0.2, stride=0.2)
        assert got == pytest.approx(0.2704918032786885)

    def test_perfect_prediction(self):
        got = EDER(prediction=["a"] * 5, id="u", duration=1.0,
                   emotion=[{"emo": "angry", "start": 0.0, "end": 1.0}],
                   window_length=0.2, stride=0.2)
        assert got == pytest.approx(0.0)

    def test_overlapping_windows_split(self):
        """window 0.4, stride 0.2: adjacent different-label windows
        share the overlap half/half."""
        got = EDER(prediction=["n", "a"], id="u", duration=0.6,
                   emotion=[{"emo": "angry", "start": 0.3, "end": 0.6}],
                   window_length=0.4, stride=0.2)
        # pred segments after split: n 0-0.3, a 0.3-0.6 -> perfect
        assert got == pytest.approx(0.0)


class TestBLEU:
    def test_perfect_and_zero(self):
        out = corpus_bleu(["the cat sat on the mat"],
                          [["the cat sat on the mat"]])
        assert out["BLEU"] == pytest.approx(100.0)
        out = corpus_bleu(["x y z q"], [["a b c d"]])
        assert out["BLEU"] == 0.0

    def test_hand_computed_precisions(self):
        """hyp 'the the the cat' vs ref 'the cat sat':
        1-gram: clip('the')=1, 'cat'=1 -> 2/4; 2-gram: 'the cat' 1/3;
        3-gram: 0/2 -> BLEU=0 but precisions pinned."""
        out = corpus_bleu(["the the the cat"], [["the cat sat"]],
                          max_order=3)
        np.testing.assert_allclose(out["precisions"],
                                   [50.0, 100 / 3, 0.0], atol=1e-9)
        assert out["BLEU"] == 0.0
        assert out["BP"] == 1.0  # hyp_len 4 >= ref_len 3

    def test_brevity_penalty(self):
        """hyp len 2 vs ref len 4 with perfect 1/2-gram precision:
        BLEU(order 2) = exp(1-4/2) * 1."""
        out = corpus_bleu(["a b"], [["a b c d"]], max_order=2)
        assert out["BP"] == pytest.approx(math.exp(1 - 4 / 2))
        assert out["BLEU"] == pytest.approx(100 * math.exp(-1.0))

    def test_multi_reference_clip_and_bp(self):
        """Clip counts take the per-reference max; BP uses the closest
        reference length."""
        out = corpus_bleu(["the cat"],
                          [["the cat sat down", "a cat"]], max_order=1)
        # closest ref length to 2 is 2 -> BP 1
        assert out["BP"] == 1.0
        assert out["precisions"][0] == pytest.approx(100.0)

    def test_stats_interface(self):
        """Reference docstring-style usage (utils/bleu.py:36-47):
        3 reference streams, ind2lab mapping -> BLEU 0 for a wrong
        3-token hypothesis."""
        bleu = BLEUStats()
        i2l = {0: "a", 1: "b"}
        bleu.append(
            ids=["utterance1"],
            predict=[[0, 1, 1]],
            targets=[[[0, 1, 0]], [[0, 1, 1]], [[1, 1, 0]]],
            ind2lab=lambda batch: [[i2l[int(x)] for x in seq]
                                   for seq in batch])
        stats = bleu.summarize()
        assert stats["BLEU"] == 0.0
        buf = io.StringIO()
        bleu.write_stats(buf)
        assert "BLEU" in buf.getvalue()

    def test_stats_exact_match_corpus(self):
        bleu = BLEUStats()
        bleu.append(ids=["u1", "u2"],
                    predict=[["hello", "world", "now", "here"],
                             ["good", "day", "sir", "again"]],
                    targets=[[["hello", "world", "now", "here"],
                              ["good", "day", "sir", "again"]]])
        assert bleu.summarize("BLEU") == pytest.approx(100.0)
