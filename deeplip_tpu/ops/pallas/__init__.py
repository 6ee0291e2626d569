from deeplip_tpu.ops.pallas.fbank_kernel import pallas_audio_features

__all__ = ["pallas_audio_features"]
