"""Video (lipreading) speaker-classification trainer.

Recipe parity with ``train_video.py``: Adam(3e-4, weight-decay 1e-4) with a
CosineAnnealing(T_max=5) schedule stepped per *iteration* — the reference's
(nonstandard) ``scheduler.step()`` placement at ``train_video.py:140-143``
— cross-entropy over speaker classes, per-epoch checkpoints
(``train_video.py:169``), and an embedding-extraction mode that saves
``(1, T, 512)`` per-clip feature arrays under key ``'data'`` in the
reference's ``embedding/<spk>/<clip>.npz`` layout (``train_video.py:99-106``,
consumed by the fusion back-ends via ``np.load(...)['data'].squeeze(-3)``).

TPU-first: the uint8 clip batch is shipped once; the jitted step does the
whole transform (normalize/crop/flip) + 3D frontend + per-frame trunk + TCN
+ loss on device, batch sharded over the mesh. Clips are length-bucketed;
padded frames are masked out of the consensus (the reference likewise pads
zeros and masks only the consensus mean, ``model.py:16-17``).
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
from deeplip_tpu.core.mesh import (
    data_sharding,
    make_mesh,
    replicated_sharding,
    stacked_data_sharding,
)
from deeplip_tpu.data.video_dataset import VideoClipBatches
from deeplip_tpu.losses.softmax import softmax_cross_entropy
from deeplip_tpu.models.lipreading import Lipreading
from deeplip_tpu.ops import video as V
from deeplip_tpu.train import checkpoint as ckpt
from deeplip_tpu.train.metrics import NanGuard, StepLogger
from deeplip_tpu.train.schedules import cosine_annealing_schedule
from deeplip_tpu.train.state import TrainState, torch_adam


class VideoTrainer:
    def __init__(
        self,
        model_cfg: Config,
        num_classes: int,
        mesh=None,
        lr: float = 3e-4,
        weight_decay: float = 1e-4,
        t_max: int = 5,
        crop_size: tuple[int, int] = (88, 88),
        exp_root: str = "exp",
        log_time: str | None = None,
        extract_feats: bool = False,
        hidden_dim: int = 256,
        compute_dtype: str = "float32",
        trunk_layers: tuple[int, ...] = (2, 2, 2, 2),
        steps_per_dispatch: int = 1,
    ):
        self.model_cfg = model_cfg
        self.num_classes = num_classes
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = int(np.prod(self.mesh.devices.shape))
        self.crop_size = crop_size
        self.model = Lipreading.from_config(model_cfg, num_classes, extract_feats=False)
        if hidden_dim != 256 or tuple(trunk_layers) != (2, 2, 2, 2):
            self.model = self.model.clone(hidden_dim=hidden_dim,
                                          trunk_layers=tuple(trunk_layers))
        # bf16 compute for the training step (params/eval stay float32)
        if compute_dtype in ("bf16", "bfloat16"):
            self.train_model = self.model.clone(dtype=jnp.bfloat16)
        else:
            self.train_model = self.model
        self.schedule = cosine_annealing_schedule(lr, t_max)
        self.tx = torch_adam(self.schedule, weight_decay=weight_decay)
        self.steps_per_dispatch = max(int(steps_per_dispatch), 1)
        self.log_time = log_time or time.strftime("%b_%d_%H-%M-%S_%Y")
        self.exp_dir = os.path.join(exp_root, self.log_time)
        self.current_epoch = 0
        self.state: TrainState | None = None

    # ------------------------------------------------------------------
    def _init_state(self, seed: int = 0) -> TrainState:
        x = jnp.zeros((2, 8) + self.crop_size + (1,), jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(seed), x)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(variables["params"]),
            step=0,
        )
        return jax.device_put(state, replicated_sharding(self.mesh))

    def ensure_state(self) -> TrainState:
        if self.state is None:
            self.state = self._init_state()
        return self.state

    # ------------------------------------------------------------------
    def _step_math(self, state: TrainState, clips_u8, lengths, labels, key):
        kt, kd = jax.random.split(key)
        x = V.train_transform(clips_u8, kt, self.crop_size)[..., None]
        # zero temporal padding AFTER the transform — the reference's
        # collate pads zeros post-transform (dataset.py:123-139), not
        # -2.55-valued normalized black frames (see ops/video.py:
        # mask_pad_frames). Length-0 mesh-pad rows replicate row 0's
        # pixels (train() below), so mask them with row 0's length: their
        # pad frames zero out exactly like the source row's, and BN batch
        # statistics see only duplicated real rows — never the ~-2.55
        # normalized-black pads
        x = V.mask_pad_frames(x, jnp.where(lengths > 0, lengths, lengths[0]))
        return self._step_from_frames(state, x, lengths, labels, kd)

    def _step_from_frames(self, state: TrainState, x, lengths, labels, kd):
        """One optimizer step from ALREADY-TRANSFORMED frames ``(B,T,H,W,1)``
        (the on-device random crop/flip of :func:`_step_math` already
        applied). Split out so the train-parity harness can feed torch and
        this trainer bit-identical inputs (``scripts/parity_check.py
        --train-parity-video``)."""
        # mesh-divisibility pad rows carry length 0 (the loop replicates a
        # real row's pixels so BN statistics see no blank images): mask them
        # out of the loss and accuracy
        valid = (lengths > 0).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(valid), 1.0)

        def loss_fn(params):
            logits, updates = self.train_model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                lengths=jnp.maximum(lengths, 1),
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": kd},
            )
            per_ex = softmax_cross_entropy(logits, labels, reduction="none")
            loss = jnp.sum(per_ex * valid) / denom
            acc = jnp.sum((jnp.argmax(logits, -1) == labels) * valid) / denom
            return loss, (updates["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, batch_stats=new_stats, opt_state=opt_state,
                       step=state.step + 1),
            {"loss": loss, "acc": acc},
        )

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step(self, state: TrainState, clips_u8, lengths, labels, key):
        return self._step_math(state, clips_u8, lengths, labels, key)

    @partial(jax.jit, static_argnums=0)
    def _train_step_frames(self, state: TrainState, x, lengths, labels, key):
        """Parity/test entry: one step from pre-transformed frames (no
        random crop/flip — ``key`` only drives dropout). Not donated: the
        harness compares states across steps."""
        return self._step_from_frames(state, x, lengths, labels, key)

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step_group(self, state: TrainState, clips_u8, lengths, labels, keys):
        """K train steps in ONE device program (``lax.scan`` over stacked
        same-shape batches): on hosts with expensive dispatch this runs at
        the pure-device step rate (measured on this rig: bs 128 goes from
        560 to ~1,018 clips/sec, `benchmarks/fori_step_bench.py`); on PCIe
        hosts it trims per-step launch overhead. Inputs are stacked
        ``(K, B, ...)``; ``keys`` holds the K per-step RNG keys, so K
        grouped steps consume randomness exactly like K single steps."""

        def body(state, batch):
            clips, lens, labs, key = batch
            state, metrics = self._step_math(state, clips, lens, labs, key)
            return state, metrics

        return jax.lax.scan(body, state, (clips_u8, lengths, labels, keys))

    def train(self, batches: VideoClipBatches, epochs: int = 1, seed: int = 0,
              auto_resume: bool = False) -> TrainState:
        if auto_resume:
            latest = ckpt.latest_checkpoint(self.exp_dir)
            if latest is not None and latest > self.current_epoch:
                self.load(os.path.join(self.exp_dir, f"net_{latest}"))
        state = self.ensure_state()
        os.makedirs(self.exp_dir, exist_ok=True)
        log_every = 10
        logger = StepLogger(self.exp_dir, print_every=log_every, prefix="video")
        guard = NanGuard()
        key = jax.random.PRNGKey(seed)
        step = int(state.step)
        clip_shard = data_sharding(self.mesh, ndim=4)
        vec_shard = data_sharding(self.mesh, ndim=1)
        group_shard = stacked_data_sharding(self.mesh, ndim=5)
        gvec_shard = stacked_data_sharding(self.mesh, ndim=2)
        for epoch in range(self.current_epoch + 1, epochs + 1):
            self.current_epoch = epoch
            pending: list[dict] = []

            def flush(pending, state, key, step):
                """Run the pending same-shape batches: one grouped dispatch
                for a full run of K, individual steps otherwise (epoch/bucket
                tails) — partial groups would each compile a fresh scan
                program per (K', shape), a recompilation storm on hosts with
                slow compiles."""
                subs = []
                for _ in pending:
                    key, sub = jax.random.split(key)
                    subs.append(sub)
                if len(pending) == self.steps_per_dispatch and len(pending) > 1:
                    state, metrics = self._train_step_group(
                        state,
                        jax.device_put(
                            np.stack([p["clips"] for p in pending]), group_shard),
                        jax.device_put(
                            np.stack([p["lengths"] for p in pending]), gvec_shard),
                        jax.device_put(
                            np.stack([p["labels"] for p in pending]), gvec_shard),
                        jnp.stack(subs),
                    )
                    metrics = {k2: v[-1] for k2, v in metrics.items()}
                else:
                    for p, sub in zip(pending, subs):
                        state, metrics = self._train_step(
                            state,
                            jax.device_put(p["clips"], clip_shard),
                            jax.device_put(p["lengths"], vec_shard),
                            jax.device_put(p["labels"], vec_shard),
                            sub,
                        )
                step += len(pending)
                return state, metrics, key, step

            metrics = None
            b = 0
            last_log = step
            for batch in batches.epoch(epoch):
                b = len(batch["labels"])
                pad = -b % self.n_devices
                if pad:
                    # replicate row 0's pixels (not zeros: blank images would
                    # pollute BN batch statistics) and mark pads with
                    # length 0 so the step masks them out of loss/acc
                    batch["clips"] = np.concatenate(
                        [batch["clips"],
                         np.repeat(batch["clips"][:1], pad, axis=0)]
                    )
                    batch["lengths"] = np.concatenate(
                        [batch["lengths"], np.zeros((pad,), batch["lengths"].dtype)]
                    )
                    batch["labels"] = np.concatenate(
                        [batch["labels"],
                         np.repeat(batch["labels"][:1], pad, axis=0)]
                    )
                if pending and pending[-1]["clips"].shape != batch["clips"].shape:
                    state, metrics, key, step = flush(pending, state, key, step)
                    pending = []
                pending.append(batch)
                if len(pending) < self.steps_per_dispatch:
                    continue
                state, metrics, key, step = flush(pending, state, key, step)
                pending = []
                if step - last_log >= log_every:
                    last_log = step
                    loss = float(metrics["loss"])
                    guard.check(loss)
                    logger.log(step, examples=b, loss=loss, acc=float(metrics["acc"]),
                               lr=float(self.schedule(step)), epoch=epoch)
            if pending:
                state, metrics, key, step = flush(pending, state, key, step)
            if metrics is None:
                raise RuntimeError(
                    f"epoch {epoch}: no batches produced — is the clip "
                    "directory empty or fully filtered out?"
                )
            guard.check(float(metrics["loss"]))
            logger.log(step, examples=b, loss=float(metrics["loss"]),
                       acc=float(metrics["acc"]), lr=float(self.schedule(step)),
                       epoch=epoch)
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
            "batch_stats": ckpt.fetch_tree(state.batch_stats),
        }
        ckpt.save_checkpoint(self.exp_dir, epoch, tree)

    def load(self, path_or_tag: str) -> None:
        exp_dir, tag = os.path.split(path_or_tag.rstrip("/"))
        tree = ckpt.load_checkpoint(exp_dir or self.exp_dir, tag)
        state = self.ensure_state()
        self.state = TrainState(
            params=jax.device_put(tree["params"], replicated_sharding(self.mesh)),
            batch_stats=jax.device_put(tree["batch_stats"], replicated_sharding(self.mesh)),
            opt_state=state.opt_state,
            step=state.step,
        )
        self.current_epoch = int(tree.get("epoch", 0))

    # ------------------------------------------------------------------
    def _extract_fn(self):
        # memoized: a fresh jax.jit object per call would re-trace every
        # bucket shape on each extraction sweep (r5 — the CLI/serve/AV-bench
        # surfaces call extract_clip_features repeatedly)
        if getattr(self, "_extract_jit", None) is not None:
            return self._extract_jit

        @jax.jit
        def extract(params, batch_stats, clips_u8, lengths):
            with jax.default_matmul_precision("high"):
                x = V.eval_transform(clips_u8, self.crop_size)[..., None]
                # zeroed pad frames == the conv's own zero padding, so a
                # padded batch extracts bit-equal to the reference's
                # per-clip batch-1 loop (train_video.py:99-106)
                x = V.mask_pad_frames(x, lengths)
                feats = self.model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x,
                    method=self.model.frame_features,
                )
            return feats  # (B, T, backend_out)

        self._extract_jit = extract
        return extract

    def extract_clip_features(self, batches: VideoClipBatches, out_root: str | None = None):
        """Per-clip ``(1, T, 512)`` frame-feature arrays; optionally saved in
        the reference's ``embedding/<name>.npz`` layout. Returns
        ``{name: (T_valid, 512) ndarray}``.

        Like the audio extractor (r4), the next batch's uint8 clips ship
        host→device (``device_put`` enqueues asynchronously) while the
        current batch computes and its features fetch — on transport-bound
        links the H2D is a large share of extraction wall-clock (a 32-clip
        48-frame bucket is ~14 MB)."""
        state = self.ensure_state()
        extract = self._extract_fn()
        out = {}

        def drain(names, lengths, staged):
            feats = np.asarray(
                extract(state.params, state.batch_stats, staged, lengths))
            for i, name in enumerate(names):
                t = int(lengths[i])
                out[name] = feats[i, :t]
                if out_root:
                    path = os.path.join(out_root, name + ".npz")
                    os.makedirs(os.path.dirname(path), exist_ok=True)
                    np.savez(path, data=out[name][None])  # (1, T, 512) parity

        pending = None
        for batch in batches.epoch(0):
            staged = (batch["names"], batch["lengths"],
                      jax.device_put(batch["clips"]))
            if pending is not None:
                drain(*pending)
            pending = staged
        if pending is not None:
            drain(*pending)
        return out

    def _embed_mean_fn(self):
        # memoized like _extract_fn (one jit object across sweeps)
        if getattr(self, "_embed_mean_jit", None) is not None:
            return self._embed_mean_jit
        extract = self._extract_fn()

        @jax.jit
        def embed_mean(params, batch_stats, clips_u8, lengths):
            feats = extract(params, batch_stats, clips_u8, lengths)
            # masked time-mean ON DEVICE: pad-frame features are nonzero
            # (BN shifts), so mask by valid length; summing the same valid
            # terms plus exact zeros == mean over the valid prefix
            mask = (jnp.arange(feats.shape[1])[None, :]
                    < lengths[:, None]).astype(feats.dtype)
            return (feats * mask[..., None]).sum(axis=1) / jnp.maximum(
                lengths, 1).astype(feats.dtype)[:, None]

        self._embed_mean_jit = embed_mean
        return embed_mean

    def extract_clip_embeddings(self, batches: VideoClipBatches) -> dict:
        """Per-clip time-mean embeddings ``{name: (512,)}`` — the fusion /
        score back-ends' consumption pattern (``train_fusion.py:274``),
        with the time reduction ON DEVICE: the full ``(B, T, 512)``
        frame-feature tensor never crosses device→host (~T× less fetch —
        ~50× on protocol-length clips; measured material on the AV sweep,
        BENCH.md "AV protocol"). Use :meth:`extract_clip_features` when the
        per-frame features themselves are the product (reference
        ``embedding/*.npz`` layout)."""
        state = self.ensure_state()
        embed = self._embed_mean_fn()
        out = {}

        def drain(names, lengths, staged_clips, staged_lengths):
            emb = np.asarray(
                embed(state.params, state.batch_stats, staged_clips,
                      staged_lengths))
            for i, name in enumerate(names):
                out[name] = emb[i]

        pending = None  # one-batch H2D lookahead (as extract_clip_features)
        for batch in batches.epoch(0):
            staged = (batch["names"], batch["lengths"],
                      jax.device_put(batch["clips"]),
                      jax.device_put(batch["lengths"]))
            if pending is not None:
                drain(*pending)
            pending = staged
        if pending is not None:
            drain(*pending)
        return out

    def embedding_store(self, batches: VideoClipBatches, name_map=None):
        """Utterance-level video embeddings: time-mean of per-clip features,
        averaged over each utterance's clip group (the consumption pattern of
        the fusion/score back-ends, ``train_fusion.py:274-275``).

        ``name_map`` maps clip name -> utterance name (grouping key);
        defaults to the clip name itself (one clip per utterance).
        Returns an :class:`deeplip_tpu.eval.scoring.EmbeddingStore`.
        """
        from collections import defaultdict

        from deeplip_tpu.eval.scoring import EmbeddingStore

        means = self.extract_clip_embeddings(batches)
        groups: dict[str, list[np.ndarray]] = defaultdict(list)
        for clip_name, vec in means.items():
            utt = name_map(clip_name) if name_map else clip_name
            groups[utt].append(vec)
        store = EmbeddingStore()
        for utt, vecs in groups.items():
            store[utt] = np.mean(vecs, axis=0)
        return store

    def classify_logits(self, clips_u8, lengths):
        """Eval-mode logits for a uint8 batch (for tests/accuracy eval)."""
        state = self.ensure_state()
        if not hasattr(self, "_classify_fn"):

            @jax.jit
            def run(params, batch_stats, clips_u8, lengths):
                # eval path: pin 'high' matmul precision like extraction
                # (TPU f32 default is single-pass bf16 — near-tie classes
                # would flip vs the reference)
                with jax.default_matmul_precision("high"):
                    x = V.eval_transform(clips_u8, self.crop_size)[..., None]
                    x = V.mask_pad_frames(x, lengths)
                    return self.model.apply(
                        {"params": params, "batch_stats": batch_stats},
                        x,
                        lengths=lengths,
                    )

            self._classify_fn = run
        return np.asarray(
            self._classify_fn(state.params, state.batch_stats, clips_u8, lengths))
