"""Online serving: speaker verification/identification from a trained model.

The reference has no serving surface — its verification workflow is
offline (extract embeddings to ``exp/<t>/test_xv*/**.npy``, then score a
trial file; ``train_audio.py:484-544``). :class:`SpeakerVerifier` wraps the
same extraction + cosine machinery as an enroll/verify/identify API for
production use on TPU.
"""

from deeplip_tpu.serve.verifier import ProfileVerifier, SpeakerVerifier, VerifyResult


def __getattr__(name):
    # AVSpeakerVerifier pulls in the whole fusion stack; import lazily
    if name == "AVSpeakerVerifier":
        from deeplip_tpu.serve.av import AVSpeakerVerifier

        return AVSpeakerVerifier
    if name == "MicroBatcher":
        from deeplip_tpu.serve.microbatch import MicroBatcher

        return MicroBatcher
    raise AttributeError(name)


__all__ = ["AVSpeakerVerifier", "MicroBatcher", "ProfileVerifier",
           "SpeakerVerifier", "VerifyResult"]
