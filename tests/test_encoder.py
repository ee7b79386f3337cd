"""Label-encoder tests (reference dataio/encoder.py semantics)."""

import pytest

from tsasr_tpu.data.encoder import (
    CategoricalEncoder,
    CTCTextEncoder,
    TextEncoder,
)


class TestCategoricalEncoder:
    def test_update_and_encode(self):
        enc = CategoricalEncoder()
        enc.update_from_iterable(["spk1", "spk2", "spk1", "spk3"])
        assert len(enc) == 3
        assert enc.encode_label("spk2") == 1
        assert enc.encode_sequence(["spk3", "spk1"]) == [2, 0]
        assert enc.decode_ndim([[0, 1], [2]]) == [["spk1", "spk2"],
                                                  ["spk3"]]

    def test_unk_fallback(self):
        enc = CategoricalEncoder()
        enc.update_from_iterable("abc")
        with pytest.raises(KeyError):
            enc.encode_label("z")
        enc.add_unk()
        assert enc.encode_label("z") == enc.lab2ind["<unk>"]

    def test_insert_label_shifts_occupant(self):
        enc = CategoricalEncoder()
        enc.update_from_iterable(["a", "b"])
        enc.insert_label("<blank>", 0)
        assert enc.encode_label("<blank>") == 0
        # "a" got moved but stays encodable and the map stays bijective
        assert len(enc.lab2ind) == 3
        assert sorted(enc.ind2lab) == [0, 1, 2]
        assert enc.decode_ndim([enc.encode_label("a")]) == ["a"]

    def test_save_load_roundtrip(self, tmp_path):
        enc = CategoricalEncoder()
        enc.update_from_iterable(["x", "y"])
        enc.add_unk()
        path = str(tmp_path / "enc.json")
        enc.save(path)
        enc2 = CategoricalEncoder()
        enc2.load(path)
        assert enc2.lab2ind == enc.lab2ind
        assert enc2.unk_label == "<unk>"
        enc2.expect_len(3)
        with pytest.raises(RuntimeError):
            enc2.expect_len(4)

    def test_load_or_create(self, tmp_path):
        path = str(tmp_path / "enc.json")
        enc = CategoricalEncoder().load_or_create(
            path, from_iterables=[["a", "b"]],
            special_labels={"unk": "<unk>"})
        assert len(enc) == 3
        # second call loads (ignores new sources)
        enc2 = CategoricalEncoder().load_or_create(
            path, from_iterables=[["zzz"]])
        assert enc2.lab2ind == enc.lab2ind

    def test_update_from_didataset(self):
        data = [{"label": "cat"}, {"label": "dog"}, {"label": "cat"}]
        enc = CategoricalEncoder()
        enc.update_from_didataset(data, "label")
        assert len(enc) == 2


class TestTextEncoder:
    def test_sequence_default_and_bos_eos(self):
        enc = TextEncoder()
        enc.update_from_iterable([["h", "i"], ["h", "o"]])
        enc.add_bos_eos()
        seq = enc.encode_sequence(["h", "o"])
        with_bos = enc.prepend_bos_label(seq)
        with_eos = enc.append_eos_label(seq)
        assert with_bos[0] == enc.lab2ind["<bos>"]
        assert with_eos[-1] == enc.lab2ind["<eos>"]

    def test_shared_bos_eos(self):
        enc = TextEncoder()
        enc.update_from_iterable([["a"]])
        enc.add_bos_eos(bos_label="<s>", eos_label="<s>")
        assert enc.lab2ind["<s>"] == enc.lab2ind["<s>"]
        assert len(enc) == 2

    def test_specials_survive_save(self, tmp_path):
        enc = TextEncoder()
        enc.update_from_iterable([["a", "b"]])
        enc.add_bos_eos()
        path = str(tmp_path / "t.json")
        enc.save(path)
        enc2 = TextEncoder()
        enc2.load(path)
        assert enc2.bos_label == "<bos>" and enc2.eos_label == "<eos>"


class TestCTCTextEncoder:
    def test_blank_and_collapse(self):
        enc = CTCTextEncoder()
        enc.update_from_iterable([["a", "b"]])
        enc.add_blank()
        assert enc.collapse_labels(
            ["a", "a", "<blank>", "b", "b", "<blank>"]) == ["a", "b"]
        ids = enc.encode_sequence(
            ["a", "a", "<blank>", "b"], allow_unk=False)
        collapsed = enc.collapse_indices_ndim(ids)
        assert enc.decode_ndim(collapsed) == ["a", "b"]

    def test_no_merge(self):
        enc = CTCTextEncoder()
        enc.update_from_iterable([["a"]])
        enc.add_blank()
        assert enc.collapse_labels(["a", "a"], merge_repeats=False) == \
            ["a", "a"]
