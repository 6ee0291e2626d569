from deeplip_tpu.interop.kaldi import (
    read_ark_entry,
    read_scp,
    write_ark_scp,
    KaldiHelper,
)
from deeplip_tpu.interop.torch_import import (
    import_speaker_embnet_state_dict,
    load_reference_audio_checkpoint,
)

__all__ = [
    "read_ark_entry",
    "read_scp",
    "write_ark_scp",
    "KaldiHelper",
    "import_speaker_embnet_state_dict",
    "load_reference_audio_checkpoint",
]
