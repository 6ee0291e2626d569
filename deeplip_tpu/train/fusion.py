"""Audio-visual fusion trainer: frozen encoders, trainable fusion head.

Orchestration parity with the reference's fusion ``Trainer``
(``train_fusion.py:36-315``): frozen audio TDNN + frozen video Lipreading
(both eval-mode — BN running stats, no dropout — per
``train_fusion.py:248-252``), a LowFER head and a CrossEntropy criterion as
the only trainables (``train_fusion.py:120-124``), SGD + MultiStep
schedule, bad video-audio pairs masked out of the loss
(``train_fusion.py:276-288``), avg-last-2 checkpoint averaging.

TPU-first difference — batched clips: the reference embeds each clip of
each batch item separately with a host round-trip per clip
(``train_fusion.py:267-281``); here the ``(B, G, T, H, W)`` clip tensor is
folded to ``(B·G, T, H, W)``, embedded in ONE device call, time-mean'd per
clip and group-mean'd per item with masks — inside the same jitted step as
the audio encoder, fusion head, and optimizer update.

Test-time extraction reproduces the live path of
``extract_test_xv_{lomgrid,grid}``: z-norm audio xv ++ z-norm clip-group
mean video embedding, concatenated (the fusion head is bypassed,
``train_fusion.py:352-358``); ``use_fusion_head=True`` switches to the
head's output instead.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeplip_tpu.core.config import Config
from deeplip_tpu.core.mesh import data_sharding, make_mesh, replicated_sharding
from deeplip_tpu.losses.softmax import build_criterion
from deeplip_tpu.models.fusion import CompactBilinearPooling, LinearFusion, LowFER
from deeplip_tpu.models.lipreading import Lipreading
from deeplip_tpu.models.tdnn import SpeakerEmbNet
from deeplip_tpu.ops import features as F
from deeplip_tpu.ops import video as V
from deeplip_tpu.ops.masked import length_mask
from deeplip_tpu.data.prefetch import device_prefetch
from deeplip_tpu.train import checkpoint as ckpt
from deeplip_tpu.train.audio import masked_cmvn
from deeplip_tpu.train.metrics import NanGuard, StepLogger
from deeplip_tpu.train.schedules import multistep_schedule
from deeplip_tpu.train.state import TrainState, build_optimizer


def _znorm(x: jnp.ndarray) -> jnp.ndarray:
    """Per-vector z-norm over feature dims (``train_fusion.py:233-238``)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    std = jnp.std(x, axis=-1, keepdims=True)
    return (x - mu) / std


class FusionTrainer:
    def __init__(
        self,
        audio_model_opts: Config,
        video_model_cfg: Config,
        n_spk: int,
        audio_data_opts: Config | None = None,
        mesh=None,
        lr: float = 0.5,
        weight_decay: float = 1e-5,
        momentum: float = 0.9,
        lr_decay_step=(4, 8),
        lr_decay: float = 0.1,
        steps_per_epoch: int = 1,
        crop_size: tuple[int, int] = (88, 88),
        video_hidden_dim: int = 256,
        video_trunk_layers: tuple[int, ...] = (2, 2, 2, 2),
        fusion_head: str = "lowfer",
        loss: str = "CrossEntropy",
        scale: float = 30.0,
        margin: float = 0.2,
        exp_root: str = "exp",
        log_time: str | None = None,
        compute_dtype: str = "float32",
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = int(np.prod(self.mesh.devices.shape))
        self.n_spk = n_spk
        self.crop_size = crop_size
        self.feat_cfg = F.FeatureConfig.from_config(audio_data_opts or {})
        import dataclasses

        self.raw_feat_cfg = dataclasses.replace(self.feat_cfg, normalize=False, delta=False)

        self.audio_model = SpeakerEmbNet.from_config(audio_model_opts)
        self.video_model = Lipreading.from_config(video_model_cfg, n_spk, extract_feats=True)
        if video_hidden_dim != 256 or tuple(video_trunk_layers) != (2, 2, 2, 2):
            self.video_model = self.video_model.clone(
                hidden_dim=video_hidden_dim, trunk_layers=tuple(video_trunk_layers))
        # bf16 activation compute for the TRAIN step only (params stay f32;
        # test-time extraction keeps f32 + 'high' matmul precision — parity):
        # same convention as train/audio.py:128-132 and train/video.py.
        self.compute_dtype = str(compute_dtype)
        if self.compute_dtype in ("bf16", "bfloat16"):
            self.train_audio_model = self.audio_model.clone(dtype=jnp.bfloat16)
            self.train_video_model = self.video_model.clone(dtype=jnp.bfloat16)
            self._train_dtype = jnp.bfloat16
        else:
            self.train_audio_model = self.audio_model
            self.train_video_model = self.video_model
            self._train_dtype = jnp.float32
        emb_dim = self.audio_model.embedding_dim
        # head selection ≙ the reference's (partly commented) alternates at
        # train_fusion.py:82-84: LowFER (live), Linearfusion, CompactBilinearPooling
        self.fusion_head_name = fusion_head
        if fusion_head == "lowfer":
            self.fusion_head = LowFER(
                input_dims=(emb_dim, self.video_model.backend_out), output_dim=emb_dim
            )
        elif fusion_head == "linear":
            self.fusion_head = LinearFusion(hidden_size=emb_dim, extract_feats=True)
        elif fusion_head == "cbp":
            self.fusion_head = CompactBilinearPooling(output_dim=emb_dim)
        else:
            raise NotImplementedError(f"fusion head {fusion_head!r}")

        self.loss_name = loss
        self.criterion = build_criterion(loss, n_spk, scale, margin)
        self.schedule = multistep_schedule(lr, list(lr_decay_step), lr_decay, steps_per_epoch)
        # torch's SGD skips parameters whose grad is None entirely — no
        # coupled weight decay, no momentum. The reference head has such
        # dead parameters: LowFER's U/V never reach the loss (the MFB
        # branch is computed then overwritten, LBP.py:48-51), so they stay
        # bit-frozen for the whole fusion run. An unmasked optax chain
        # would instead decay them every step (~5.6e-5 drift over 10
        # reference-recipe steps, caught by scripts/parity_check.py
        # --train-parity-fusion). Detect dead head params with a gradient
        # probe and mask them out of the optimizer.
        self.tx = build_optimizer(
            "sgd", self.schedule, momentum=momentum,
            weight_decay=weight_decay,
            trainable_mask={"fusion": self._live_head_param_mask(),
                            "criterion": True},
        )

        self.log_time = log_time or time.strftime("%b_%d_%H-%M-%S_%Y")
        self.exp_dir = os.path.join(exp_root, self.log_time)
        self.current_epoch = 0
        self.state: TrainState | None = None
        self._extract_fns: dict = {}
        self._head_extra_vars: dict = {}
        # frozen encoder variables, set by init or load_encoders
        self.audio_vars = None
        self.video_vars = None

    def _live_head_param_mask(self):
        """Bool pytree over the fusion head's params: True where a
        parameter is reachable from the head output (torch: grad is not
        None), False for structurally dead parameters (LowFER U/V — the
        MFB branch is overwritten, LBP.py:48-51; LinearFusion's fc2 under
        ``extract_feats``). Dead params must receive NO update — torch's
        optimizer never sees them."""
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(17), 3)
        e1 = jax.random.normal(k1, (2, self.audio_model.embedding_dim), jnp.float32)
        e2 = jax.random.normal(k2, (2, self.video_model.backend_out), jnp.float32)
        fvars = self._head_init(k3, e1, e2)
        extra = {k: v for k, v in fvars.items() if k != "params"}

        def probe(p):
            out = self._head_apply({"params": p, **extra}, e1, e2)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.grad(probe)(fvars.get("params", {}))
        return jax.tree.map(lambda x: bool(jnp.any(x != 0)), g)

    # ------------------------------------------------------------------
    def init_encoders(self, seed: int = 0, example_frames: int = 60) -> None:
        dim = F.feature_dim(self.feat_cfg)
        self.audio_vars = self.audio_model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, example_frames, dim), jnp.float32)
        )
        self.video_vars = self.video_model.init(
            jax.random.PRNGKey(seed + 1),
            jnp.zeros((1, 4) + self.crop_size + (1,), jnp.float32),
        )

    def load_encoders(self, audio_ckpt: str | None, video_ckpt: str | None) -> None:
        # the jitted extraction fns close over the encoder variables at
        # trace time — drop cached traces so new weights take effect
        self._extract_fns = {}
        if self.state is not None and int(self.state.step) > 0:
            import warnings

            warnings.warn(
                "load_encoders after training steps: the jitted _train_step "
                "trace still closes over the OLD encoder weights; construct "
                "a fresh FusionTrainer to train against new encoders"
            )
        return self._load_encoders_impl(audio_ckpt, video_ckpt)

    def _load_encoders_impl(self, audio_ckpt: str | None, video_ckpt: str | None) -> None:
        """Load frozen encoder weights from checkpoints saved by the audio /
        video trainers (≙ ``load_finetune``, ``train_fusion.py:191-215``)."""
        if self.audio_vars is None:
            self.init_encoders()
        if audio_ckpt:
            exp_dir, tag = os.path.split(audio_ckpt.rstrip("/"))
            tree = ckpt.load_checkpoint(exp_dir, tag)
            self.audio_vars = {
                "params": tree["params"]["model"],
                "batch_stats": tree["batch_stats"]["model"],
            }
        if video_ckpt:
            exp_dir, tag = os.path.split(video_ckpt.rstrip("/"))
            tree = ckpt.load_checkpoint(exp_dir, tag)
            self.video_vars = {
                "params": tree["params"],
                "batch_stats": tree["batch_stats"],
            }

    def load_torch_encoders(self, audio_pth: str | None, video_pth: str | None) -> None:
        """Load the frozen encoders from reference PyTorch checkpoints
        (the migration analogue of ``load_finetune``, train_fusion.py:191-196)."""
        from deeplip_tpu.interop.torch_import import (
            load_reference_audio_checkpoint,
            load_reference_video_checkpoint,
        )

        if self.audio_vars is None:
            self.init_encoders()
        if audio_pth:
            p, s = load_reference_audio_checkpoint(
                audio_pth, n_blocks=len(self.audio_model.contexts)
            )
            self.audio_vars = {"params": p, "batch_stats": s}
        if video_pth:
            p, s = load_reference_video_checkpoint(video_pth)
            merged_p = {**self.video_vars["params"], **p}
            merged_s = {**self.video_vars["batch_stats"], **s}
            self.video_vars = {"params": merged_p, "batch_stats": merged_s}

    def load_torch_fusion_head(self, fusion_pth: str) -> None:
        """Load a trained fusion head (+ criterion when recoverable) from a
        reference fusion checkpoint — ``net_*.pth`` / ``net_avg.pth``
        (``train_fusion.py:177-179``: LowFER ``state_dict`` plus the
        pickled criterion module; the criterion is recovered even without
        the reference package importable). Requires ``fusion_head ==
        'lowfer'``. The optimizer state stays fresh, matching our
        restore-opt-in checkpoint semantics."""
        if self.fusion_head_name != "lowfer":
            raise NotImplementedError(
                "reference fusion checkpoints hold LowFER U/V; construct "
                "the trainer with fusion_head='lowfer' to import one")
        from deeplip_tpu.interop.torch_import import (
            load_reference_fusion_checkpoint,
        )

        head, crit = load_reference_fusion_checkpoint(fusion_pth)
        state = self.ensure_state()
        params = dict(state.params)
        params["fusion"] = {**params["fusion"], **head}
        if crit is not None:
            params["criterion"] = crit
        self.state = TrainState(
            params=jax.device_put(params, replicated_sharding(self.mesh)),
            batch_stats=state.batch_stats,
            opt_state=self.tx.init(params),
            step=state.step,
        )

    def load_head_checkpoint(self, path: str) -> None:
        """Load a fusion-head checkpoint saved by this trainer (``save``),
        given as ``exp_dir/tag`` like ``load_encoders`` — the analogue of
        the reference ``Trainer.load`` (``train_fusion.py:180-188``), which
        restores ``state_dict`` + epoch but deliberately leaves the
        criterion/optimizer commented out (fresh optimizer state)."""
        exp_dir, tag = os.path.split(str(path).rstrip("/"))
        tree = ckpt.load_checkpoint(exp_dir, tag)
        state = self.ensure_state()
        params = jax.device_put(tree["params"], replicated_sharding(self.mesh))
        self.state = TrainState(
            params=params,
            batch_stats=state.batch_stats,
            opt_state=self.tx.init(params),
            step=state.step,
        )
        self.current_epoch = int(tree.get("epoch", self.current_epoch))

    def _init_state(self, seed: int = 0) -> TrainState:
        if self.audio_vars is None:
            self.init_encoders(seed)
        emb_dim = self.audio_model.embedding_dim
        e1 = jnp.zeros((2, emb_dim), jnp.float32)
        e2 = jnp.zeros((2, self.video_model.backend_out), jnp.float32)
        fvars = self._head_init(jax.random.PRNGKey(seed + 2), e1, e2)
        self._head_extra_vars = {k: v for k, v in fvars.items() if k != "params"}
        fvars = {"params": fvars.get("params", {}), **self._head_extra_vars}
        fused = self._head_apply(fvars, e1, e2)
        # criterion over the fused vector (CrossEntropy or LMCL branch,
        # train_fusion.py:109-116); input dims are inferred, which fixes the
        # reference's latent 1024-vs-1536 shape bug (see PARITY.md)
        cvars = self.criterion.init(
            jax.random.PRNGKey(seed + 3), fused, jnp.zeros((2,), jnp.int32)
        )
        params = {"fusion": fvars.get("params", {}), "criterion": cvars["params"]}
        state = TrainState(
            params=params, batch_stats={}, opt_state=self.tx.init(params), step=0
        )
        return jax.device_put(state, replicated_sharding(self.mesh))

    def _head_vars(self, params):
        v = {"params": params["fusion"]}
        if self._head_extra_vars:
            v.update(self._head_extra_vars)
        return v

    def _head_init(self, key, e1, e2):
        if self.fusion_head_name == "linear":
            return self.fusion_head.init(key, jnp.concatenate([e1, e2], axis=-1))
        return self.fusion_head.init(key, e1, e2)

    def _head_apply(self, variables, e1, e2):
        if self.fusion_head_name == "linear":
            return self.fusion_head.apply(variables, jnp.concatenate([e1, e2], axis=-1))
        return self.fusion_head.apply(variables, e1, e2)

    def ensure_state(self) -> TrainState:
        if self.state is None:
            self.state = self._init_state()
        return self.state

    # ------------------------------------------------------------------
    def _audio_embed(self, pcm, model=None):
        model = model if model is not None else self.audio_model
        feats = F.extract_features(pcm, self.feat_cfg)
        xv, _ = model.apply(
            self.audio_vars, feats, method=model.extract_embedding
        )
        return xv

    def _video_group_embed(self, clips_u8, clip_lengths, group_sizes, model=None):
        """(B, G, T, H, W) uint8 -> (B, D) masked clip-group mean embedding."""
        model = model if model is not None else self.video_model
        b, g, t = clips_u8.shape[:3]
        x = V.eval_transform(clips_u8.reshape((b * g, t) + clips_u8.shape[3:]),
                             self.crop_size)[..., None]
        # zero temporal padding post-transform: the reference embeds every
        # clip unpadded at batch 1 (train_fusion.py:268-274); zeroed pad
        # frames reproduce its conv zero-padding exactly (ops/video.py:
        # mask_pad_frames), so the dense (B, G, T, ...) batch matches the
        # per-clip loop bit-for-bit
        x = V.mask_pad_frames(x, clip_lengths.reshape(b * g))
        feats = model.apply(
            self.video_vars, x, method=model.frame_features
        )  # (B*G, T, D)
        fmask = length_mask(clip_lengths.reshape(b * g), t, feats.dtype)[..., None]
        clip_emb = jnp.sum(feats * fmask, axis=1) / jnp.maximum(
            jnp.sum(fmask, axis=1), 1.0
        )  # time-mean per clip (train_fusion.py:274)
        clip_emb = clip_emb.reshape(b, g, -1)
        gmask = length_mask(group_sizes, g, clip_emb.dtype)[..., None]
        return jnp.sum(clip_emb * gmask, axis=1) / jnp.maximum(
            jnp.sum(gmask, axis=1), 1.0
        )  # group mean (train_fusion.py:275)

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step(self, state: TrainState, pcm, clips_u8, clip_lengths, group_sizes, labels):
        # frozen encoders run outside the grad scope (bf16 when configured)
        xv_audio = jax.lax.stop_gradient(
            self._audio_embed(pcm, model=self.train_audio_model)
        )
        em_video = jax.lax.stop_gradient(
            self._video_group_embed(clips_u8, clip_lengths, group_sizes,
                                    model=self.train_video_model)
        )
        valid = (group_sizes > 0).astype(jnp.float32)

        def loss_fn(params):
            # head compute follows the train dtype; the criterion (tiny, and
            # margin-sensitive) stays float32 like the audio trainer's loss
            e1 = xv_audio.astype(self._train_dtype)
            e2 = em_video.astype(self._train_dtype)
            fused = self._head_apply(self._head_vars(params), e1, e2)
            fused = fused.astype(jnp.float32)
            per_ex, logits = self.criterion.apply(
                {"params": params["criterion"]}, fused, labels, reduction="none"
            )
            denom = jnp.maximum(jnp.sum(valid), 1.0)
            # masked mean ≙ the reference dropping bad pairs before the loss
            loss = jnp.sum(per_ex * valid) / denom
            acc = jnp.sum((jnp.argmax(logits, -1) == labels) * valid) / denom
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, batch_stats={}, opt_state=opt_state,
                       step=state.step + 1),
            {"loss": loss, "acc": acc},
        )

    def train(self, pipeline, epochs: int = 1, auto_resume: bool = False) -> TrainState:
        if auto_resume:
            latest = ckpt.latest_checkpoint(self.exp_dir)
            if latest is not None and latest > self.current_epoch:
                tree = ckpt.load_checkpoint(self.exp_dir, latest)
                state0 = self.ensure_state()
                self.state = TrainState(
                    params=jax.device_put(tree["params"], replicated_sharding(self.mesh)),
                    batch_stats={},
                    opt_state=state0.opt_state,
                    step=state0.step,
                )
                self.current_epoch = int(tree.get("epoch", 0))
        state = self.ensure_state()
        os.makedirs(self.exp_dir, exist_ok=True)
        logger = StepLogger(self.exp_dir, print_every=10, prefix="fusion")
        guard = NanGuard()
        step = int(state.step)
        shard = {
            "pcm": data_sharding(self.mesh, 2),
            "clips": data_sharding(self.mesh, 5),
            "clip_lengths": data_sharding(self.mesh, 2),
            "group_sizes": data_sharding(self.mesh, 1),
            "labels": data_sharding(self.mesh, 1),
        }

        def put(batch):
            # pad the batch to a multiple of the mesh so it shards evenly
            # (mirrors train/video.py; padded rows get group_sizes=0, which
            # the masked loss already excludes — same semantics as the
            # reference's bad-pair mask, train_fusion.py:276-288)
            b = len(batch["labels"])
            pad = -b % self.n_devices
            out = {"n_real": b}
            for k, arr in batch.items():
                if pad and k in shard:
                    arr = np.concatenate(
                        [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)]
                    )
                out[k] = jax.device_put(arr, shard[k]) if k in shard else arr
            return out

        for epoch in range(self.current_epoch + 1, epochs + 1):
            self.current_epoch = epoch
            # double-buffered H2D: batch N+1 transfers while step N runs
            metrics = None
            last_log = step
            for batch in device_prefetch(pipeline.epoch(epoch), put):
                state, metrics = self._train_step(
                    state, batch["pcm"], batch["clips"], batch["clip_lengths"],
                    batch["group_sizes"], batch["labels"],
                )
                step += 1
                # metric fetches cost a device round-trip over this rig's
                # tunnel: fetch only at log cadence (like the audio trainer)
                if step - last_log >= 10:
                    last_log = step
                    loss = float(metrics["loss"])
                    guard.check(loss)
                    logger.log(step, examples=batch["n_real"], loss=loss,
                               acc=float(metrics["acc"]), epoch=epoch)
            if metrics is None:
                raise RuntimeError(
                    f"epoch {epoch}: no batches produced — empty AV pairing "
                    "or misconfigured pipeline?"
                )
            if step != last_log:  # avoid a duplicate record when the final
                loss = float(metrics["loss"])  # step landed on the cadence
                guard.check(loss)
                logger.log(step, examples=batch["n_real"], loss=loss,
                           acc=float(metrics["acc"]), epoch=epoch)
            self.state = state
            self.save(epoch)
        logger.close()
        self.state = state
        return state

    # ------------------------------------------------------------------
    def save(self, epoch: int | None = None) -> None:
        state = self.ensure_state()
        epoch = epoch if epoch is not None else self.current_epoch
        tree = {
            "epoch": epoch,
            "params": ckpt.fetch_tree(state.params),
            "batch_stats": {},
        }
        ckpt.save_checkpoint(self.exp_dir, epoch, tree)

    def model_average(self, avg_num: int = 2) -> None:
        """avg-last-2 (``train_fusion.py:158-174``)."""
        epochs = [self.current_epoch - i for i in range(avg_num) if self.current_epoch - i >= 1]
        tree = ckpt.average_checkpoints(self.exp_dir, epochs)
        state = self.ensure_state()
        self.state = TrainState(
            params=jax.device_put(tree["params"], replicated_sharding(self.mesh)),
            batch_stats={},
            opt_state=state.opt_state,
            step=state.step,
        )

    # ------------------------------------------------------------------
    # test-time paired extraction
    # ------------------------------------------------------------------
    def extract_pair_embedding(
        self, pcm, feat_lengths, clips_u8, clip_lengths, group_sizes,
        use_fusion_head: bool = False, sample_lengths=None,
        return_parts: bool = False,
    ) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
        """Per-utterance fused test embedding.

        Default: z-norm(audio xv) ++ z-norm(video group mean) concat — the
        reference's live path (``train_fusion.py:352-358``). With
        ``use_fusion_head`` the LowFER head output is returned instead.
        ``return_parts`` instead returns the raw ``(audio_xv, video_em)``
        pair (for the score-fusion back-end, which needs separate cosines
        per modality — reference ``utils.py:331-382``).
        """
        state = self.ensure_state()
        key = (use_fusion_head, return_parts)
        if key not in self._extract_fns:

            @jax.jit
            def run(params, pcm, feat_lengths, sample_lengths, clips_u8,
                    clip_lengths, group_sizes):
                with jax.default_matmul_precision("high"):
                    # sample_lengths mask the padded-PCM pre-emphasis leak
                    # (see ops.features.extract_features)
                    feats = F.extract_features(
                        pcm, self.raw_feat_cfg, sample_lengths=sample_lengths
                    )
                    if self.feat_cfg.normalize:
                        feats = masked_cmvn(feats, feat_lengths)
                    if self.feat_cfg.delta:
                        # the encoder was built for 3x-dim delta features
                        # (mirrors train/audio.py's eval path)
                        feats = F.add_deltas(feats, order=2)
                    xv, _ = self.audio_model.apply(
                        self.audio_vars, feats, lengths=feat_lengths,
                        method=self.audio_model.extract_embedding,
                    )
                    em = self._video_group_embed(clips_u8, clip_lengths, group_sizes)
                    if return_parts:
                        return xv, em
                    if use_fusion_head:
                        return self._head_apply(self._head_vars(params), xv, em)
                    return jnp.concatenate([_znorm(xv), _znorm(em)], axis=-1)

            self._extract_fns[key] = run
        if sample_lengths is None:
            sample_lengths = np.full((len(pcm),), pcm.shape[-1], np.int32)
        out = self._extract_fns[key](
            state.params, pcm, feat_lengths, sample_lengths, clips_u8,
            clip_lengths, group_sizes
        )
        if return_parts:
            return np.asarray(out[0]), np.asarray(out[1])
        return np.asarray(out)


def embed_av_items(
    trainer: "FusionTrainer",
    items,
    *,
    max_clips: int = 2,
    clip_frames: int = 32,
    use_fusion_head: bool = False,
    return_parts: bool = False,
    chunk_size: int = 16,
):
    """Batched paired AV embeddings for ``(name, wav, clip_group)`` items.

    The buffering core shared by the fusion CLI's trial extraction
    (``cli/train_fusion.py:extract_pairs``) and the AV serving API: chunks
    items, pads PCM/clips into dense device batches, and runs
    :meth:`FusionTrainer.extract_pair_embedding` once per chunk (vs the
    reference's one host round-trip per clip, ``train_fusion.py:267-281``).

    ``wav`` is a path or float32 PCM at the trainer's rate; each clip-group
    entry is an ``.npz``/``.npy`` path or a ``(T, H, W)`` uint8 array.
    Every clip is center-cropped to the trainer's eval geometry BEFORE
    buffering (reference ``preprocess.py:74-92`` arithmetic, identical to
    ``ops/video.py:center_crop``) so mixed-geometry corpora share one
    buffer exactly and the device-side center crop is the identity;
    zero-padding a smaller clip into a bigger buffer instead would shift
    its crop off-center and average padding into the trunk's spatial
    pooling (the clip-length masks are temporal only).

    Returns a fused :class:`EmbeddingStore`, or with ``return_parts`` the
    ``(audio_store, video_store)`` pair for the score-fusion back-end.
    """
    from deeplip_tpu.data.audio_io import read_wav
    from deeplip_tpu.data.video_dataset import load_clip
    from deeplip_tpu.eval.scoring import EmbeddingStore
    from deeplip_tpu.ops.framing import frame_len_step, num_frames

    store = EmbeddingStore()
    audio_store, video_store = EmbeddingStore(), EmbeddingStore()
    items = list(items)
    # frame geometry from the trainer's feature config, not hard-coded
    # 25ms/10ms@16k (other rates/windows would corrupt the masks)
    f_len, f_step = frame_len_step(
        trainer.feat_cfg.win_len, trainer.feat_cfg.win_shift,
        trainer.feat_cfg.rate)
    th, tw = trainer.crop_size

    def crop_to_eval(d: np.ndarray, label) -> np.ndarray:
        h, w = d.shape[1], d.shape[2]
        if h < th or w < tw:
            raise ValueError(
                f"clip {label!r} is {h}x{w}, smaller than the eval crop "
                f"{th}x{tw} (train.crop_size) — cannot extract")
        dh = int(round((h - th)) / 2.0)
        dw = int(round((w - tw)) / 2.0)
        return d[:, dh : dh + th, dw : dw + tw]

    def load_one_clip(c):
        if isinstance(c, str):
            return crop_to_eval(load_clip(c)[:clip_frames], c)
        return crop_to_eval(np.asarray(c, np.uint8)[:clip_frames], "array")

    for i in range(0, len(items), chunk_size):
        chunk = items[i : i + chunk_size]
        pcm_list, loaded = [], []
        for _name, wav, group in chunk:
            if isinstance(wav, str):
                y, _sr = read_wav(wav)
            else:
                y = np.asarray(wav, np.float32)
            pcm_list.append(y)
            loaded.append([load_one_clip(c) for c in list(group)[:max_clips]])
        max_s = max(len(y) for y in pcm_list)
        b = len(chunk)
        pcm = np.zeros((b, max_s), np.float32)
        lengths = np.zeros((b,), np.int32)
        sample_lengths = np.zeros((b,), np.int32)
        clip_lengths = np.zeros((b, max_clips), np.int32)
        group_sizes = np.zeros((b,), np.int32)
        clips = np.zeros((b, max_clips, clip_frames, th, tw), np.uint8)
        for r, (y, group) in enumerate(zip(pcm_list, loaded)):
            pcm[r, : len(y)] = y
            lengths[r] = num_frames(len(y), f_len, f_step)
            sample_lengths[r] = len(y)
            for g, d in enumerate(group):
                clips[r, g, : len(d), : d.shape[1], : d.shape[2]] = d
                clip_lengths[r, g] = len(d)
            group_sizes[r] = len(group)
        if return_parts:
            xv, em = trainer.extract_pair_embedding(
                pcm, lengths, clips, clip_lengths, group_sizes,
                sample_lengths=sample_lengths, return_parts=True,
            )
            for r, (name, _w, _g) in enumerate(chunk):
                audio_store[name] = xv[r]
                video_store[name] = em[r]
        else:
            fused = trainer.extract_pair_embedding(
                pcm, lengths, clips, clip_lengths, group_sizes,
                use_fusion_head=use_fusion_head,
                sample_lengths=sample_lengths,
            )
            for r, (name, _w, _g) in enumerate(chunk):
                store[name] = fused[r]
    if return_parts:
        return audio_store, video_store
    return store
