"""deeplip_tpu — TPU-native audio-visual lip-biometrics framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the DeepLip
reference (audio-visual speaker verification: audio x-vector TDNNs, video
lipreading networks, and audio-visual fusion), designed TPU-first:

- all feature extraction (MFCC/fbank/logfbank/STFT) runs batched on device,
  expressed as MXU matmuls (DFT-as-matmul, mel projection, DCT) with an
  optional fused Pallas kernel;
- models are Flax modules compiled once per shape bucket under ``jax.jit``;
- data parallelism is a ``jax.sharding.Mesh`` + NamedSharding (not NCCL
  replication), with gradients reduced by XLA collectives over ICI;
- trial scoring is one batched matmul over the gathered trial pairs instead
  of a 20k-iteration Python loop.

Subpackages
-----------
core     : configuration tree, mesh/sharding helpers
ops      : DSP ops (framing, spectral transforms, features, masking), Pallas kernels
models   : Flax model zoo (TDNN x-vector, Lipreading, fusion heads)
losses   : classification margin losses and triplet mining
data     : manifests, speaker-balanced sampling, host->device pipelines
train    : train loops, schedules, checkpointing (incl. averaging)
eval     : embedding extraction, trial scoring, EER, PLDA, fusion back-ends
interop  : torch-checkpoint import, Kaldi ark/scp adapter
cli      : train_audio / train_video / train_fusion entry points
"""

__version__ = "0.1.0"
