from deeplip_tpu.models.pooling import (
    MeanStdPooling,
    AttentiveStatPooling,
    MonoHeadAttention,
    MultiHeadAttentivePooling,
)
from deeplip_tpu.models.tdnn import TDNNBlock, SpeakerEmbNet
from deeplip_tpu.models.resnet import ResNetTrunk, BasicBlock
from deeplip_tpu.models.tcn import TemporalConvNet, MultibranchTemporalConvNet
from deeplip_tpu.models.lipreading import Lipreading
from deeplip_tpu.models.fusion import LowFER, LinearFusion, CompactBilinearPooling
from deeplip_tpu.models.shufflenetv2 import ShuffleNetV2Trunk

__all__ = [
    "MeanStdPooling",
    "AttentiveStatPooling",
    "MonoHeadAttention",
    "MultiHeadAttentivePooling",
    "TDNNBlock",
    "SpeakerEmbNet",
    "ResNetTrunk",
    "BasicBlock",
    "TemporalConvNet",
    "MultibranchTemporalConvNet",
    "Lipreading",
    "LowFER",
    "LinearFusion",
    "CompactBilinearPooling",
    "ShuffleNetV2Trunk",
]
