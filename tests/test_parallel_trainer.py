"""Sequence/pipeline parallelism through the TRAINER (round-4 verdict
item 2): ``--sequence_parallel_count`` / ``--pipeline_parallel_count``
run-opts drive the full recipe entry point — fit (loss/optimizer),
greedy valid search, beam test eval, checkpoints, WER files — with the
encoder routed through ``encode_seq_parallel`` / ``encode_pipeline``
inside the jitted step (``models/transducer.py::encode_predict`` mesh
routing). The reference integrates its one parallelism (DDP) into the
trainer the same way (``core.py:1464-1490``).

Runs on the 8-device virtual CPU mesh from conftest.
"""

import json
import os
import sys

import pytest


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("lsmix_par")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.make_synthetic_dataset import make_dataset
    # min_dur 1.2 s: the sp=4 shards must each hold more encoder frames
    # than the halo (att_context_size-1 + kernel_size-1 = 7); 1.2 s ->
    # 121 fbank frames -> pad_feats_to 128 -> 32 encoder frames -> 8/shard
    make_dataset(str(root), n_mix=6, n_speakers=3, utts_per_speaker=4,
                 min_dur=1.2, max_dur=2.0)
    return str(root)


def _vocab_size(synth_data):
    chars = set()
    for split in ("train-2mix", "dev-clean-2mix", "test-clean-2mix"):
        with open(os.path.join(synth_data, f"{split}.jsonl")) as f:
            for line in f:
                for text in json.loads(line)["texts"]:
                    chars.update("▁" + text.replace(" ", "▁"))
    return len(chars) + 1


HPARAMS = os.path.join(os.path.dirname(__file__), "..", "hparams",
                       "LibriSpeechMix", "conformer-t_none.yaml")

# deterministic tiny config: dropout/augment off so the parallel run's
# losses can be pinned against the plain-mesh run
COMMON = ["--debug", "--noprogressbar", "--num_epochs", "2",
          "--beam_size", "2", "--valid_search_freq", "1",
          "--d_model", "32", "--nhead", "4", "--d_ffn", "64",
          "--decoder_neurons", "24", "--joint_dim", "48",
          "--dropout", "0.0", "--augment", "False"]


def _epoch_losses(out_dir):
    import re
    log = open(os.path.join(out_dir, "train_log.txt")).read()
    return [float(m) for m in
            re.findall(r"train loss: ([\d.e+-]+)", log)]


def _run(variant, synth_data, out, extra):
    from tsasr_tpu.recipes.librispeechmix import run_experiment
    return run_experiment(variant=variant, argv=[
        HPARAMS, "--data_folder", synth_data,
        "--output_folder", out,
        "--vocab_size", str(_vocab_size(synth_data)), *COMMON, *extra])


class TestSeqParallelTrainer:
    def test_fit_and_eval_sp4(self, synth_data, tmp_path):
        """dp=2 x sp=4 fit + greedy valid + beam test through the
        recipe; train losses equal the plain-mesh run (same data, no
        dropout — the halo-exchange encoder is exact)."""
        causal = ["--encoder_num_layers", "2", "--kernel_size", "5",
                  "--causal_encoder", "True", "--att_context_size", "4",
                  "--frontend_padding", "causal"]
        brain = _run("none", synth_data, str(tmp_path / "sp"),
                     causal + ["--sequence_parallel_count", "4"])
        assert brain.mesh is not None and "seq" in brain.mesh.axis_names
        assert brain.mesh.shape["seq"] == 4
        sp_losses = _epoch_losses(str(tmp_path / "sp"))
        assert len(sp_losses) == 2
        wer = os.path.join(str(tmp_path / "sp"), "wer_test-clean-2mix.txt")
        assert open(wer).read().startswith("%WER")

        _run("none", synth_data, str(tmp_path / "plain"), causal)
        plain_losses = _epoch_losses(str(tmp_path / "plain"))
        for a, b in zip(sp_losses, plain_losses):
            assert abs(a - b) / max(abs(b), 1e-9) < 1e-3, \
                (sp_losses, plain_losses)

    def test_non_causal_config_raises_scoped_error(self, synth_data,
                                                   tmp_path):
        """The flagship non-causal config cannot shard T: the error
        must say why and what to change (round-4 verdict weak #4)."""
        with pytest.raises(ValueError, match="causal"):
            _run("none", synth_data, str(tmp_path / "bad"),
                 ["--encoder_num_layers", "2",
                  "--sequence_parallel_count", "4"])


class TestPipelineParallelTrainer:
    def test_fit_and_eval_pp4(self, synth_data, tmp_path):
        """dp=2 x pp=4 (one Conformer layer per stage) fit + eval
        through the recipe; losses equal the plain-mesh run."""
        layers = ["--encoder_num_layers", "4", "--kernel_size", "5"]
        brain = _run("none", synth_data, str(tmp_path / "pp"),
                     layers + ["--pipeline_parallel_count", "4"])
        assert brain.mesh is not None and "pipe" in brain.mesh.axis_names
        pp_losses = _epoch_losses(str(tmp_path / "pp"))
        assert len(pp_losses) == 2
        wer = os.path.join(str(tmp_path / "pp"), "wer_test-clean-2mix.txt")
        assert open(wer).read().startswith("%WER")

        _run("none", synth_data, str(tmp_path / "plain"), layers)
        plain_losses = _epoch_losses(str(tmp_path / "plain"))
        for a, b in zip(pp_losses, plain_losses):
            assert abs(a - b) / max(abs(b), 1e-9) < 1e-3, \
                (pp_losses, plain_losses)
