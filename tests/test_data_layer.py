"""Host data-layer tests: pipeline DAG, dataset, batching, samplers,
tokenizer, audio IO, manifest prep, loader resume.

Mirrors the reference's unit coverage for dataio
(``tests/unittests/test_data_pipeline.py``, ``test_batching.py``,
``test_samplers.py``, ``test_dataloader.py``, ``test_tokenizer.py``).
"""

import json
import math
import os

import numpy as np
import pytest

from tsasr_tpu.data import (
    CharTokenizer,
    DistributedSamplerWrapper,
    DynamicBatchSampler,
    DynamicItemDataset,
    PaddedBatch,
    ReproducibleRandomSampler,
    SaveableDataLoader,
    prepare_librispeechmix,
    provides,
    takes,
)
from tsasr_tpu.data.audio import read_audio, resample, write_wav
from tsasr_tpu.data.flac import read_flac, write_flac
from tsasr_tpu.data.mixing import mix_signals
from tsasr_tpu.data.pipeline import DataPipeline
from tsasr_tpu.data.tokenizer import (
    BpeTokenizer,
    UnigramTokenizer,
    load_tokenizer,
    train_tokenizer,
)


class TestDataPipeline:
    def test_topological_multi_output(self):
        pipe = DataPipeline(static_keys=["a"])

        @takes("a")
        @provides("b", "c")
        def item(a):
            yield a + 1
            yield a + 2

        pipe.add_dynamic_item(item)
        pipe.add_dynamic_item(lambda b, c: b * c, takes=["b", "c"],
                              provides=["d"])
        pipe.set_output_keys(["d"])
        assert pipe({"a": 3})["d"] == 4 * 5

    def test_cycle_detection(self):
        pipe = DataPipeline(static_keys=[])
        pipe.add_dynamic_item(lambda y: y, takes=["y"], provides=["x"])
        pipe.add_dynamic_item(lambda x: x, takes=["x"], provides=["y"])
        pipe.set_output_keys(["x"])
        with pytest.raises(RuntimeError, match="Circular"):
            pipe({})


class TestDataset:
    def make_dataset(self, tmp_path):
        data = {f"utt{i}": {"duration": float(i + 1),
                            "wrd": f"hello {i}",
                            "path": "{DATA_ROOT}/" + f"utt{i}.wav"}
                for i in range(10)}
        p = tmp_path / "data.json"
        p.write_text(json.dumps(data))
        return DynamicItemDataset.from_json(
            str(p), replacements={"DATA_ROOT": "/data"})

    def test_from_json_replacements(self, tmp_path):
        ds = self.make_dataset(tmp_path)
        ds.set_output_keys(["id", "path"])
        assert ds[0]["path"] == "/data/utt0.wav"

    def test_filtered_sorted(self, tmp_path):
        ds = self.make_dataset(tmp_path)
        view = ds.filtered_sorted(key_max_value={"duration": 5.0},
                                  sort_key="duration", reverse=True)
        ds.set_output_keys(["id", "duration"])
        durs = [view[i]["duration"] for i in range(len(view))]
        assert durs == sorted(durs, reverse=True)
        assert max(durs) <= 5.0

    def test_dynamic_item_on_dataset(self, tmp_path):
        ds = self.make_dataset(tmp_path)

        @takes("wrd")
        @provides("n_words")
        def count(wrd):
            return len(wrd.split())

        ds.add_dynamic_item(count)
        ds.set_output_keys(["n_words"])
        assert ds[0]["n_words"] == 2


class TestPaddedBatch:
    def test_pad_and_lengths(self):
        exs = [{"id": "a", "sig": np.ones(10, np.float32)},
               {"id": "b", "sig": np.ones(5, np.float32)}]
        batch = PaddedBatch(exs)
        assert batch.sig.data.shape == (2, 10)
        np.testing.assert_allclose(batch.sig.lengths, [1.0, 0.5])
        assert batch.id == ["a", "b"]
        assert batch.sig.data[1, 5:].sum() == 0

    def test_pad_to_multiple(self):
        exs = [{"sig": np.ones(10, np.float32)},
               {"sig": np.ones(5, np.float32)}]
        batch = PaddedBatch(exs, pad_to_multiple={"sig": 8})
        assert batch.sig.data.shape == (2, 16)
        np.testing.assert_allclose(batch.sig.lengths, [10 / 16, 5 / 16])


class TestSamplers:
    def test_reproducible_random(self):
        s1 = ReproducibleRandomSampler(range(100), seed=7, epoch=3)
        s2 = ReproducibleRandomSampler(range(100), seed=7, epoch=3)
        assert list(s1) == list(s2)
        s2.set_epoch(4)
        assert list(s1) != list(s2)

    def test_dynamic_batch_sampler_capacity(self):
        class FakeDS:
            def __init__(self, durs):
                self.durs = durs

            def __len__(self):
                return len(self.durs)

            def raw(self, i):
                return {"duration": self.durs[i]}

        durs = [1.0, 2.0, 3.0, 10.0, 1.5, 2.5, 9.0, 0.5] * 4
        ds = FakeDS(durs)
        sampler = DynamicBatchSampler(ds, max_batch_length=12.0,
                                      num_buckets=4, shuffle=True,
                                      max_batch_ex=6, seed=0)
        seen = []
        for batch in sampler:
            assert len(batch) <= 6
            max_len = max(durs[i] for i in batch)
            assert max_len * len(batch) <= 12.0 + max_len  # capacity rule
            seen.extend(batch)
        assert sorted(seen) == list(range(len(durs)))

    def test_distributed_wrapper_covers_all(self):
        base = [[1, 2], [3], [4, 5], [6]]
        shards = [list(DistributedSamplerWrapper(base, rank=r, world_size=3))
                  for r in range(3)]
        assert all(len(s) == 2 for s in shards)
        flat = [x for s in shards for b in s for x in b]
        assert set(flat) == {1, 2, 3, 4, 5, 6}


class TestTokenizer:
    def test_roundtrip(self):
        texts = ["hello world", "the quick brown fox", "jumps over"]
        tok = CharTokenizer.train(texts)
        ids = tok.encode_as_ids("hello fox")
        assert tok.decode_ids(ids) == "hello fox"
        assert tok.decode_ids_to_words(ids) == ["hello", "fox"]

    def test_vocab_size_check(self):
        with pytest.raises(ValueError, match="vocab_size"):
            CharTokenizer.train(["ab"], vocab_size=100)

    def test_unk(self):
        tok = CharTokenizer.train(["abc abc"])
        ids = tok.encode_as_ids("axc")
        assert tok.unk_id in ids

    def test_save_load(self, tmp_path):
        tok = CharTokenizer.train(["hello world"])
        path = str(tmp_path / "tok.json")
        tok.save(path)
        tok2 = CharTokenizer.load(path)
        assert tok2.pieces == tok.pieces
        assert tok2.encode_as_ids("hello") == tok.encode_as_ids("hello")


BPE_CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "a cat and a rat sat",
    "the mat and the rat",
] * 5


class TestBpeTokenizer:
    def test_roundtrip(self):
        tok = BpeTokenizer.train(BPE_CORPUS, vocab_size=40)
        assert tok.vocab_size <= 40
        for text in ["the cat sat", "a rat on the mat"]:
            assert tok.decode_ids(tok.encode_as_ids(text)) == text

    def test_merges_frequent_pairs(self):
        tok = BpeTokenizer.train(BPE_CORPUS, vocab_size=40)
        # "the" is the most frequent word; BPE must learn it as one or
        # two pieces, not four chars
        pieces = tok.encode_as_pieces("the the")
        assert len(pieces) < 8
        assert any(len(p) > 1 for p in pieces)

    def test_encoding_deterministic_by_rank(self):
        tok = BpeTokenizer.train(BPE_CORPUS, vocab_size=40)
        a = tok.encode_as_ids("the cat sat on the mat")
        b = tok.encode_as_ids("the cat sat on the mat")
        assert a == b

    def test_unk_for_unseen_char(self):
        tok = BpeTokenizer.train(BPE_CORPUS, vocab_size=40)
        ids = tok.encode_as_ids("zebra!")
        assert tok.unk_id in ids

    def test_save_load(self, tmp_path):
        tok = BpeTokenizer.train(BPE_CORPUS, vocab_size=40)
        path = str(tmp_path / "bpe.json")
        tok.save(path)
        tok2 = BpeTokenizer.load(path)
        assert tok2.pieces == tok.pieces
        assert tok2.merges == tok.merges
        text = "the rat sat"
        assert tok2.encode_as_ids(text) == tok.encode_as_ids(text)
        tok3 = load_tokenizer(path)
        assert isinstance(tok3, BpeTokenizer)

    def test_batch_call(self):
        tok = BpeTokenizer.train(BPE_CORPUS, vocab_size=40)
        ids = tok(["the cat", "a rat"], task="encode")
        words = tok(ids, task="decode_from_list")
        assert words == [["the", "cat"], ["a", "rat"]]


class TestUnigramTokenizer:
    def test_roundtrip(self):
        tok = UnigramTokenizer.train(BPE_CORPUS, vocab_size=40)
        assert tok.vocab_size <= 40
        for text in ["the cat sat", "a rat on the mat"]:
            assert tok.decode_ids(tok.encode_as_ids(text)) == text

    def test_prefers_long_frequent_pieces(self):
        tok = UnigramTokenizer.train(BPE_CORPUS, vocab_size=40)
        # viterbi should segment the most frequent word into few pieces
        pieces = tok.encode_as_pieces("the")
        assert len(pieces) <= 2

    def test_probs_normalized(self):
        tok = UnigramTokenizer.train(BPE_CORPUS, vocab_size=40)
        mass = sum(math.exp(lp) for p, lp in
                   zip(tok.pieces, tok.log_probs) if p != "<unk>")
        assert 0.5 < mass <= 1.0 + 1e-6

    def test_save_load(self, tmp_path):
        tok = UnigramTokenizer.train(BPE_CORPUS, vocab_size=40)
        path = str(tmp_path / "uni.json")
        tok.save(path)
        tok2 = UnigramTokenizer.load(path)
        text = "the rat sat"
        assert tok2.encode_as_ids(text) == tok.encode_as_ids(text)
        tok3 = load_tokenizer(path)
        assert isinstance(tok3, UnigramTokenizer)

    def test_unk_for_unseen_char(self):
        tok = UnigramTokenizer.train(BPE_CORPUS, vocab_size=40)
        ids = tok.encode_as_ids("zebra!")
        assert tok.unk_id in ids


class TestTrainTokenizerDispatch:
    @pytest.mark.parametrize("model_type,cls", [
        ("bpe", BpeTokenizer), ("unigram", UnigramTokenizer)])
    def test_train_and_reload(self, tmp_path, model_type, cls):
        tok = train_tokenizer(str(tmp_path), BPE_CORPUS, vocab_size=40,
                              model_type=model_type)
        assert isinstance(tok, cls)
        # second call loads from disk
        tok2 = train_tokenizer(str(tmp_path), [], vocab_size=40,
                               model_type=model_type)
        assert tok2.pieces == tok.pieces

    def test_unknown_type(self, tmp_path):
        with pytest.raises(ValueError, match="model_type"):
            train_tokenizer(str(tmp_path), BPE_CORPUS, vocab_size=40,
                            model_type="wordpiece")


class TestAudio:
    def test_wav_roundtrip(self, tmp_path):
        sr = 16000
        t = np.arange(sr) / sr
        sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = str(tmp_path / "a.wav")
        write_wav(path, sig, sr)
        loaded, sr2 = read_audio(path)
        assert sr2 == sr
        np.testing.assert_allclose(loaded, sig, atol=1e-4)

    def test_resample_preserves_tone(self):
        sr, new_sr = 8000, 16000
        t = np.arange(sr) / sr
        sig = np.sin(2 * np.pi * 100 * t).astype(np.float32)
        out = resample(sig, sr, new_sr)
        assert abs(len(out) - 2 * len(sig)) <= 1
        t2 = np.arange(len(out)) / new_sr
        expected = np.sin(2 * np.pi * 100 * t2).astype(np.float32)
        # ignore filter edges
        err = np.abs(out[200:-200] - expected[200:-200]).max()
        assert err < 1e-2

    def test_flac_read_audio(self, tmp_path):
        sr = 16000
        rng = np.random.default_rng(3)
        pcm = (np.sin(2 * np.pi * 220 * np.arange(9000) / sr) * 12000
               + rng.normal(0, 100, 9000)).astype(np.int16)
        path = str(tmp_path / "x.flac")
        write_flac(path, pcm, sr)
        loaded, sr2 = read_audio(path)
        assert sr2 == sr
        np.testing.assert_array_equal(
            loaded, pcm.astype(np.float32) / 32768.0)


class TestFlacCodec:
    SR = 16000

    def _cases(self):
        rng = np.random.default_rng(0)
        sine = (np.sin(2 * np.pi * 440 * np.arange(20000) / self.SR)
                * 20000).astype(np.int16)
        return {
            "silence": np.zeros(5000, np.int16),
            "constant": np.full(5000, -321, np.int16),
            "sine": sine,
            "noise": rng.integers(-30000, 30000, 10000).astype(np.int16),
            "speechy": (sine[:12345] * 0.4
                        + rng.normal(0, 300, 12345)).astype(np.int16),
            "short": np.array([5, -7, 11], np.int16),
        }

    @pytest.mark.parametrize("use_lpc", [False, True])
    def test_lossless_roundtrip(self, tmp_path, use_lpc):
        path = str(tmp_path / "t.flac")
        for name, pcm in self._cases().items():
            write_flac(path, pcm, self.SR, use_lpc=use_lpc)
            out, sr, bps = read_flac(path)
            assert (sr, bps) == (self.SR, 16), name
            np.testing.assert_array_equal(out[:, 0], pcm.astype(np.int32),
                                          err_msg=name)

    def test_stereo_independent(self, tmp_path):
        cases = self._cases()
        st = np.stack([cases["sine"][:8000], cases["noise"][:8000]], 1)
        path = str(tmp_path / "st.flac")
        write_flac(path, st, self.SR)
        out, _, _ = read_flac(path)
        np.testing.assert_array_equal(out, st.astype(np.int32))

    def test_native_decoder_matches_python(self, tmp_path):
        from tsasr_tpu import native
        if native.get_lib() is None:
            pytest.skip("native library not built")
        path = str(tmp_path / "n.flac")
        for name, pcm in self._cases().items():
            write_flac(path, pcm, self.SR)
            res = native.flac_read(path)
            assert res is not None, name
            wav, sr = res
            assert sr == self.SR
            np.testing.assert_array_equal(
                wav, pcm.astype(np.float32) / 32768.0, err_msg=name)

    def test_bad_magic_raises(self, tmp_path):
        path = str(tmp_path / "bad.flac")
        with open(path, "wb") as f:
            f.write(b"RIFFxxxx")
        with pytest.raises(ValueError, match="magic"):
            read_flac(path)


class TestMixing:
    def test_delay_and_sum(self, tmp_path):
        sr = 1000
        a = np.ones(100, np.float32) * 0.1
        b = np.ones(50, np.float32) * 0.2
        pa, pb = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
        write_wav(pa, a, sr)
        write_wav(pb, b, sr)
        mixed = mix_signals([pa, pb], delays=[0.0, 0.05],
                            target_speaker_idx=0, sample_rate=sr,
                            start=0.0, duration=0.15)
        # mixture is 100 samples long; the crop clamps like the reference
        assert len(mixed) == math.ceil(0.1 * sr)
        # first 50 samples: only a; next 50: a+b
        np.testing.assert_allclose(mixed[:50], 0.1, atol=1e-3)
        np.testing.assert_allclose(mixed[50:100], 0.3, atol=1e-3)

    def test_gain_nontarget(self, tmp_path):
        sr = 1000
        a = np.ones(100, np.float32) * 0.5
        b = np.ones(100, np.float32) * 0.1
        pa, pb = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
        write_wav(pa, a, sr)
        write_wav(pb, b, sr)
        mixed = mix_signals([pa, pb], delays=[0.0, 0.0],
                            target_speaker_idx=0, sample_rate=sr,
                            gain_nontarget=-10.0, start=0.0, duration=0.1)
        # interferer power should be 10 dB below the target's
        interf = mixed - 0.5
        ratio = np.mean(interf ** 2) / np.mean(0.5 ** 2)
        assert abs(10 * np.log10(ratio) - (-10.0)) < 0.2


class TestPrepare:
    def make_jsonl(self, tmp_path):
        entry = {
            "id": "mix0",
            "wavs": ["spk1/a.wav", "spk2/b.wav"],
            "durations": [2.0, 3.0],
            "delays": [0.0, 1.0],
            "texts": ["HELLO THERE", "GOOD BYE"],
            "speaker_profile": [["enr1.wav", "enr2.wav"], ["enr3.wav"]],
            "speaker_profile_index": [0, 1],
            "speakers": ["s1", "s2"],
            "genders": ["m", "f"],
        }
        (tmp_path / "dev-clean-2mix.jsonl").write_text(
            json.dumps(entry) + "\n")
        return tmp_path

    def test_expansion(self, tmp_path):
        folder = self.make_jsonl(tmp_path)
        prepare_librispeechmix(str(folder), splits=["dev-clean-2mix"])
        with open(folder / "dev.json") as f:
            out = json.load(f)
        # target 0 has 2 enrollments, target 1 has 1 => 3 entries
        assert len(out) == 3
        e = out["mix0_text-0_enr1.wav"]
        assert e["duration"] == 4.0  # max(0+2, 1+3)
        assert e["wrd"] == "HELLO THERE"
        assert e["enroll_wav"].endswith("enr1.wav")
        assert "{DATA_ROOT}" in e["wavs"][0]

    def test_trim_nontarget(self, tmp_path):
        folder = self.make_jsonl(tmp_path)
        prepare_librispeechmix(str(folder), splits=["dev-clean-2mix"],
                               trim_nontarget=0.0)
        with open(folder / "dev.json") as f:
            out = json.load(f)
        e = out["mix0_text-1_enr3.wav"]  # target 1: delay 1.0, dur 3.0
        assert e["start"] == 1.0 and e["duration"] == 3.0

    def test_suppress_delay_and_overlap_exclusive(self, tmp_path):
        folder = self.make_jsonl(tmp_path)
        with pytest.raises(ValueError):
            prepare_librispeechmix(str(folder), splits=["dev-clean-2mix"],
                                   suppress_delay=True, overlap_ratio=0.5)

    def test_num_targets_min(self, tmp_path):
        folder = self.make_jsonl(tmp_path)
        prepare_librispeechmix(str(folder), splits=["dev-clean-2mix"],
                               num_targets="min")
        with open(folder / "dev.json") as f:
            out = json.load(f)
        assert all("text-0" in k for k in out)  # duration 2.0 < 3.0


class TestLoader:
    def make_ds(self):
        data = {f"u{i}": {"x": np.full(3, i, np.float32)}
                for i in range(10)}
        ds = DynamicItemDataset(data)
        ds.set_output_keys(["id", "x"])
        return ds

    def test_batching(self):
        loader = SaveableDataLoader(self.make_ds(), batch_size=3)
        batches = list(loader)
        assert len(batches) == 4
        assert batches[0].x.data.shape == (3, 3)

    def test_midepoch_resume(self):
        loader = SaveableDataLoader(self.make_ds(), batch_size=2)
        it = iter(loader)
        next(it)
        next(it)
        state = loader.save_position()
        assert state["num_batches_yielded"] == 2
        loader2 = SaveableDataLoader(self.make_ds(), batch_size=2)
        loader2.load_position(state, end_of_epoch=False)
        remaining = [b.id for b in loader2]
        assert remaining[0] == ["u4", "u5"]
        assert len(remaining) == 3

    def test_prefetch_worker(self):
        loader = SaveableDataLoader(self.make_ds(), batch_size=4,
                                    num_workers=1)
        ids = [i for b in loader for i in b.id]
        assert ids == [f"u{i}" for i in range(10)]

    def test_abandoned_prefetch_iter_reaps_worker_thread(self):
        """Dropping a prefetched iterator mid-epoch (debug_batches
        breaks do this every run) must not leak the worker thread: the
        r5 full-suite crash dumps showed abandoned workers parked
        forever in queue.put, pinning their datasets."""
        import gc
        import threading
        import time

        from tsasr_tpu.data.loader import _prefetch_iter

        before = threading.active_count()
        it = _prefetch_iter(iter(range(1000)), depth=2)
        assert next(it) == 0
        it.close()          # explicit close; GC close exercises same path
        del it
        gc.collect()
        deadline = time.time() + 5.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before

    def test_process_workers_match_serial(self):
        """Forked item-eval workers must yield the bit-identical batch
        stream (order AND values) of the serial loader."""
        serial = list(SaveableDataLoader(self.make_ds(), batch_size=3))
        proc = list(SaveableDataLoader(self.make_ds(), batch_size=3,
                                       num_workers=2,
                                       worker_mode="process"))
        assert len(proc) == len(serial)
        for a, b in zip(serial, proc):
            assert a.id == b.id
            np.testing.assert_array_equal(a.x.data, b.x.data)

    def test_process_workers_midepoch_resume(self):
        loader = SaveableDataLoader(self.make_ds(), batch_size=2,
                                    num_workers=2,
                                    worker_mode="process")
        it = iter(loader)
        next(it)
        next(it)
        state = loader.save_position()
        it.close()  # stop the in-flight epoch (terminates workers)
        loader2 = SaveableDataLoader(self.make_ds(), batch_size=2,
                                     num_workers=2,
                                     worker_mode="process")
        loader2.load_position(state, end_of_epoch=False)
        remaining = [b.id for b in loader2]
        assert remaining[0] == ["u4", "u5"]
        assert len(remaining) == 3

    def test_process_workers_propagate_exceptions(self):
        data = {f"u{i}": {"x": np.full(3, i, np.float32)}
                for i in range(6)}
        ds = DynamicItemDataset(data)

        def boom(x):
            if float(x[0]) == 4.0:
                raise ValueError("bad utterance")
            return x

        ds.add_dynamic_item(boom, takes=["x"], provides=["y"])
        ds.set_output_keys(["id", "y"])
        loader = SaveableDataLoader(ds, batch_size=2, num_workers=2,
                                    worker_mode="process")
        with pytest.raises((ValueError, RuntimeError),
                           match="bad utterance"):
            list(loader)

    def test_worker_mode_validated(self):
        with pytest.raises(ValueError, match="worker_mode"):
            SaveableDataLoader(self.make_ds(), worker_mode="fiber")


def test_bpe_duplicate_merge_strings_keep_bijection():
    """Two merge pairs producing the same string ('ab'+'c' and 'a'+'bc')
    must not create duplicate piece ids."""
    corpus = (["xabc"] * 8 + ["ab"] * 4 + ["bc"] * 4 + ["abq"] * 3
              + ["qbc"] * 3) * 3
    tok = BpeTokenizer.train(corpus, vocab_size=40)
    assert len(tok.pieces) == len(set(tok.pieces))
    for text in ["xabc ab bc"]:
        assert tok.decode_ids(tok.encode_as_ids(text)) == text
