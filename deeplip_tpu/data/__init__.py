from deeplip_tpu.data.manifest import SpeakerManifest, write_manifest
from deeplip_tpu.data.audio_io import read_wav, write_wav, resample
from deeplip_tpu.data.sampler import SpeakerBatchSampler, frame_buckets
from deeplip_tpu.data.audio_pipeline import AudioTrainPipeline, EvalUtteranceSet
from deeplip_tpu.data.prefetch import ThreadedPrefetcher

__all__ = [
    "SpeakerManifest",
    "write_manifest",
    "read_wav",
    "write_wav",
    "resample",
    "SpeakerBatchSampler",
    "frame_buckets",
    "AudioTrainPipeline",
    "EvalUtteranceSet",
    "ThreadedPrefetcher",
]
