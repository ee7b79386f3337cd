"""Inference interfaces: transcription (offline/streaming), speaker
verification, audio classification."""

from tsasr_tpu.inference.transcriber import TSASRTranscriber  # noqa: F401
from tsasr_tpu.inference.streaming import StreamingTranscriber  # noqa: F401
from tsasr_tpu.inference.speaker import SpeakerRecognition  # noqa: F401
from tsasr_tpu.inference.classifier import EncoderClassifier  # noqa: F401
from tsasr_tpu.inference.separation import SepformerSeparation  # noqa: F401
from tsasr_tpu.inference.tts import TextToSpeech  # noqa: F401
from tsasr_tpu.inference.vad import VAD  # noqa: F401
from tsasr_tpu.inference.enhancement import SpectralMaskEnhancement  # noqa: F401
