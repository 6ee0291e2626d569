"""Audio x-vector trainer: config-driven, data-parallel over a device mesh.

Orchestration parity with the reference's audio ``Trainer``
(``train_audio.py:32-481``) — speaker-balanced random-crop batches, LMCL
margin schedule (epoch ≤ 5 → init margin, then end margin,
``train_audio.py:141-145``), SGD+MultiStepLR recipe, per-epoch checkpoints,
last-N averaging, embedding extraction and cosine/PLDA scoring — but
restructured TPU-first:

- ONE jitted train step per crop-length bucket does feature extraction
  (batched MXU DSP), forward, loss, backward, and the optimizer update;
  the host only assembles PCM;
- the batch is sharded over the mesh's ``data`` axis; XLA inserts the
  gradient all-reduce over ICI (replaces ``torch.nn.DataParallel``). Batch
  statistics are computed over the global batch (sync-BN) rather than the
  reference's per-replica stats;
- test extraction runs length-bucketed batches with masked pooling — the
  padded batch reproduces per-utterance results exactly (VALID convs), at
  batched throughput instead of the reference's ``batch_size=1`` loop;
- donated state buffers keep HBM traffic minimal.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeplip_tpu.core.config import Config
from deeplip_tpu.core.mesh import (data_sharding, make_mesh, param_sharding,
                                   stacked_data_sharding,
                                   replicated_sharding)
from deeplip_tpu.data.audio_pipeline import AudioTrainPipeline, EvalUtteranceSet
from deeplip_tpu.data.prefetch import device_prefetch
from deeplip_tpu.data.manifest import SpeakerManifest
from deeplip_tpu.eval.scoring import EmbeddingStore, TrialList, cosine_eer
from deeplip_tpu.losses.softmax import AAMSoftmax, LMCL, build_criterion
from deeplip_tpu.models.tdnn import SpeakerEmbNet
from deeplip_tpu.ops import features as F
from deeplip_tpu.ops.masked import length_mask
from deeplip_tpu.train import checkpoint as ckpt
from deeplip_tpu.train.metrics import NanGuard, StepLogger
from deeplip_tpu.train.schedules import multistep_schedule
from deeplip_tpu.train.state import TrainState, build_optimizer


def masked_cmvn(feat: jnp.ndarray, lengths: jnp.ndarray, eps: float = 2e-12) -> jnp.ndarray:
    """Per-utterance CMVN over only the valid frames of a padded batch."""
    mask = length_mask(lengths, feat.shape[1], dtype=feat.dtype)[..., None]
    count = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(feat * mask, axis=1, keepdims=True) / count
    var = jnp.sum(((feat - mean) ** 2) * mask, axis=1, keepdims=True) / count
    return (feat - mean) / (jnp.sqrt(var) + eps)


def _group_batches(source, k):
    """Stack runs of K consecutive same-shape PCM batches into ``(K, B, ...)``
    group batches for :meth:`AudioTrainer._train_step_group`. Kaldi-feature
    batches and shape changes flush the pending run; partial runs (epoch or
    bucket tails) are yielded as INDIVIDUAL batches — a (K', shape) scan
    program per tail size would be a recompilation storm on hosts with slow
    compiles, while the single-step program is already compiled."""
    pending = []

    def flush():
        if len(pending) == k and k > 1:
            return [{
                "pcm": np.stack([b["pcm"] for b in pending]),
                "labels": np.stack([b["labels"] for b in pending]),
                "n_frames": pending[-1]["n_frames"],
                "group": len(pending),
            }]
        return list(pending)

    for batch in source:
        if "feats" in batch:
            if pending:
                yield from flush()
                pending = []
            yield batch
            continue
        if pending and pending[-1]["pcm"].shape != batch["pcm"].shape:
            yield from flush()
            pending = []
        pending.append(batch)
        if len(pending) == k:
            yield from flush()
            pending = []
    if pending:
        yield from flush()


class AudioTrainer:
    """End-to-end audio speaker-verification trainer."""

    def __init__(
        self,
        config: Config,
        mesh=None,
        exp_root: str = "exp",
        log_time: str | None = None,
        n_spk: int | None = None,
    ):
        self.cfg = config
        self.data_opts = config.data
        self.model_opts = config.model
        self.train_opts = config.train
        self.test_opts = config.get("test", Config())

        self.feat_cfg = F.FeatureConfig.from_config(
            self.data_opts.get("python_data_config", {})
        )
        import dataclasses as _dc

        self.eval_feat_cfg = _dc.replace(self.feat_cfg, normalize=False, delta=False)
        # 'xla' (default) or 'pallas' (fused VMEM kernel) front-end
        self.feature_backend = self.data_opts.get("python_data_config", {}).get(
            "backend", "xla"
        )

        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = int(np.prod(self.mesh.devices.shape))

        self.manifest = None
        self.data_format = self.data_opts.get("data_format", "python")
        self._kaldi_pipeline = None
        if self.data_format == "kaldi":
            # precomputed-feature training (≙ train_audio.py:42-45; the
            # reference's KaldiTrainDataset module is absent from its release)
            kcfg = self.data_opts.get("kaldi_data_config", {}).get("trainset", {})
            if kcfg.get("nn_spk2utt") and os.path.exists(str(kcfg["nn_spk2utt"])):
                from deeplip_tpu.data.kaldi_dataset import KaldiTrainPipeline

                self._kaldi_pipeline = KaldiTrainPipeline(
                    kcfg["nn_spk2utt"],
                    kcfg["nn_feat_scp"],
                    int(self.train_opts.get("bs", 256)),
                    frame_range=tuple(self.data_opts.get("frames", (200, 400))),
                    n_buckets=int(self.train_opts.get("frame_buckets", 11)),
                )
        elif self.data_opts.get("train_manifest") and os.path.exists(
            self.data_opts["train_manifest"]
        ):
            self.manifest = SpeakerManifest.load(self.data_opts["train_manifest"])
        self.n_spk = n_spk if n_spk is not None else (
            self.manifest.n_spk
            if self.manifest
            else (self._kaldi_pipeline.n_spk if self._kaldi_pipeline else 0)
        )

        arch = self.model_opts.get("arch", "etdnn")
        if arch in ("tdnn", "etdnn"):
            self.model = SpeakerEmbNet.from_config(self.model_opts)
        elif arch == "resnet":
            from deeplip_tpu.models.audio_resnet import AudioResNet

            self.model = AudioResNet.from_config(self.model_opts)
        else:
            raise NotImplementedError(f"audio arch {arch!r}")
        # bf16 compute for training halves activation HBM traffic; params
        # and the eval path stay float32 (parity). conf: train.compute_dtype
        compute_dtype = str(self.train_opts.get("compute_dtype", "float32"))
        self.train_feat_cfg = self.feat_cfg
        if compute_dtype in ("bf16", "bfloat16") and hasattr(self.model, "dtype"):
            self.train_model = self.model.clone(dtype=jnp.bfloat16)
            # training features drop to default (bf16-pass) matmul precision;
            # eval extraction keeps the parity-grade front-end
            self.train_feat_cfg = _dc.replace(self.feat_cfg, precision="default")
        else:
            self.train_model = self.model
        margin_range = self.train_opts.get("margin", [0.2, 0.2])
        self.init_margin, self.end_margin = float(margin_range[0]), float(margin_range[-1])
        self.loss_name = self.train_opts.get("loss", "LMCL")
        if self.loss_name == "Triplet":
            # parameterless online triplet mining (loss.py:18-31 + the
            # selector zoo, utils.py:31-142) — strategy via train.triplet_strategy
            from deeplip_tpu.losses.triplet import OnlineTripletLoss

            self.criterion = OnlineTripletLoss(
                margin=self.init_margin,
                strategy=self.train_opts.get("triplet_strategy", "hardest"),
            )
        else:
            self.criterion = build_criterion(
                self.loss_name,
                self.n_spk,
                float(self.train_opts.get("scale", 30.0)),
                self.init_margin,
            )

        self.batch_size = int(self.train_opts.get("bs", 256))
        self.epochs = int(self.train_opts.get("epoch", 30))
        # K train steps fused into one device program (lax.scan); the
        # sampler draws crop lengths in runs of K so consecutive batches
        # share a shape (train.steps_per_dispatch: 1 = reference behavior)
        self.steps_per_dispatch = max(
            int(self.train_opts.get("steps_per_dispatch", 1)), 1)
        self.pipeline = self._kaldi_pipeline
        if self.manifest is not None:
            # native (C++, GIL-free) wav decode when built; 'loader: python'
            # forces the stdlib reader
            reader = None
            if self.train_opts.get("loader", "native") == "native":
                from deeplip_tpu import native

                if native.available():
                    reader = native.read_wav
            from deeplip_tpu.data.audio_io import read_wav as _py_read_wav

            self.pipeline = AudioTrainPipeline(
                self.manifest,
                self.batch_size,
                frame_range=tuple(self.data_opts.get("frames", (200, 400))),
                win_len=self.feat_cfg.win_len,
                win_shift=self.feat_cfg.win_shift,
                rate=self.feat_cfg.rate,
                n_buckets=int(self.train_opts.get("frame_buckets", 11)),
                num_workers=int(self.train_opts.get("loader_workers", 8)),
                reader=reader or _py_read_wav,
                bucket_run=self.steps_per_dispatch,
                # 'auto' (default): int16 H2D iff every manifest wav is
                # integer PCM16 at the config rate — value-exact, half the
                # transfer bytes (the epoch's dominant cost on slow links;
                # benchmarks/train_hostio.py). train.transport: float32
                # opts out.
                transport=str(self.train_opts.get("transport", "auto")),
            )

        steps_per_epoch = self.pipeline.batches_per_epoch() if self.pipeline else 1
        opt_type = self.train_opts.get("type", "sgd")
        opt_opts = self.train_opts.get(opt_type, {"init_lr": 0.01})
        self.schedule = multistep_schedule(
            float(opt_opts.get("init_lr", 0.01)),
            self.train_opts.get("lr_decay_step", [15, 25]),
            float(self.train_opts.get("lr_decay", 0.1)),
            max(steps_per_epoch, 1),
        )
        finetune = self.train_opts.get("train_type") == "finetune"
        mask = {"model": not finetune, "criterion": True} if finetune else None
        self.tx = build_optimizer(
            opt_type,
            self.schedule,
            momentum=float(opt_opts.get("momentum", 0.9)),
            weight_decay=float(opt_opts.get("weight_decay", 0.0)),
            trainable_mask=mask,
        )

        self.log_time = log_time or time.strftime("%b_%d_%H-%M-%S_%Y")
        self.exp_dir = os.path.join(exp_root, self.log_time)
        self.current_epoch = 0
        self.state: TrainState | None = None
        self._embed_fns: dict[Any, Any] = {}

        self.loaded_checkpoint = False
        resume = self.train_opts.get("resume")
        if resume in ("", "None", "null", "~"):  # yaml-literal "unset" spellings
            resume = None
        if resume:
            if not os.path.exists(str(resume)):
                # a mistyped path must fail loudly, not silently evaluate
                # randomly initialized weights
                raise FileNotFoundError(f"train.resume checkpoint not found: {resume}")
            if finetune:
                self.load_finetune(str(resume))
            else:
                self.load(str(resume))
            self.loaded_checkpoint = True

    # ------------------------------------------------------------------
    # state init
    # ------------------------------------------------------------------
    def _init_state(self, example_frames: int = 200, seed: int = 0) -> TrainState:
        dim = F.feature_dim(self.feat_cfg)
        x = jnp.zeros((2, example_frames, dim), jnp.float32)
        mvars = self.model.init(jax.random.PRNGKey(seed), x)
        emb = self.model.apply(mvars, x)
        if self.loss_name == "Triplet":
            crit_params = {}
        else:
            hvars = self.criterion.init(
                jax.random.PRNGKey(seed + 1), emb, jnp.zeros((2,), jnp.int32)
            )
            crit_params = hvars["params"]
        params = {"model": mvars["params"], "criterion": crit_params}
        batch_stats = {"model": mvars["batch_stats"]}
        opt_state = self.tx.init(params)
        state = TrainState(params=params, batch_stats=batch_stats, opt_state=opt_state, step=0)
        # classifier rows shard over a 'model' mesh axis when present
        return jax.device_put(state, param_sharding(self.mesh, state))

    def ensure_state(self) -> TrainState:
        if self.state is None:
            self.state = self._init_state()
        return self.state

    # ------------------------------------------------------------------
    # train
    # ------------------------------------------------------------------
    def _criterion_apply(self, params, emb, labels, margin):
        if self.loss_name == "Triplet":
            loss, _count = self.criterion(emb, labels)
            # no classification logits: report zeros so acc reads 0
            return loss, jnp.zeros((emb.shape[0], max(self.n_spk, 1)), emb.dtype)
        if isinstance(self.criterion, (LMCL, AAMSoftmax)):
            return self.criterion.apply({"params": params}, emb, labels, margin=margin)
        return self.criterion.apply({"params": params}, emb, labels)

    @staticmethod
    def _pcm_f32(pcm):
        # int16 train transport (AudioTrainPipeline(transport='int16'|'auto')):
        # exact power-of-two rescale — the step sees bit-identical float32
        # PCM to the float32 transport for PCM16-origin crops
        if pcm.dtype == jnp.int16:
            return pcm.astype(jnp.float32) / 32768.0
        return pcm

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step(self, state: TrainState, pcm, labels, margin):
        feats = F.extract_features(
            self._pcm_f32(pcm), self.train_feat_cfg,
            backend=self.feature_backend)
        return self._step_on_features(state, feats, labels, margin)

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step_group(self, state: TrainState, pcm, labels, margin):
        """K train steps in ONE device program: ``lax.scan`` over stacked
        ``(K, B, ...)`` batches. Removes per-step dispatch overhead (on this
        rig's relay that is material; on PCIe hosts it trims launch cost).
        The audio step consumes no RNG, so K grouped steps are semantically
        identical to K single dispatches."""

        def body(state, batch):
            p, l = batch
            feats = F.extract_features(
                self._pcm_f32(p), self.train_feat_cfg,
                backend=self.feature_backend)
            state, metrics = self._step_on_features(state, feats, l, margin)
            return state, metrics

        return jax.lax.scan(body, state, (pcm, labels))

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _train_step_feats(self, state: TrainState, feats, labels, margin):
        """Train step for precomputed (Kaldi-format) features."""
        return self._step_on_features(state, feats, labels, margin)

    def _step_on_features(self, state: TrainState, feats, labels, margin):
        def loss_fn(params):
            emb, updates = self.train_model.apply(
                {"params": params["model"], "batch_stats": state.batch_stats["model"]},
                feats,
                train=True,
                mutable=["batch_stats"],
            )
            loss, logits = self._criterion_apply(params["criterion"], emb, labels, margin)
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            return loss, (updates["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats={"model": new_stats},
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "acc": acc}

    def _margin_for_epoch(self, epoch: int) -> float:
        """Margin schedule ≙ ``_adjust_margin`` (``train_audio.py:141-145``)."""
        return self.init_margin if epoch <= 5 else self.end_margin

    def train(self, epochs: int | None = None, auto_resume: bool = False) -> TrainState:
        """Run the epoch loop. ``auto_resume`` restarts from the newest
        ``net_<epoch>`` in the exp dir if one exists (crash recovery — the
        reference has no equivalent; its resume needs a hand-edited config).
        """
        if self.pipeline is None:
            raise RuntimeError("no train manifest configured")
        if auto_resume:
            latest = ckpt.latest_checkpoint(self.exp_dir)
            if latest is not None and latest > self.current_epoch:
                self.load(os.path.join(self.exp_dir, f"net_{latest}"))
        state = self.ensure_state()
        os.makedirs(self.exp_dir, exist_ok=True)
        log_every = int(self.train_opts.get("log_every", 20)) or 1
        logger = StepLogger(self.exp_dir, print_every=log_every)
        guard = NanGuard()
        epochs = epochs if epochs is not None else self.epochs
        in_shard = data_sharding(self.mesh, ndim=2)
        lab_shard = data_sharding(self.mesh, ndim=1)
        step = int(state.step)
        feats_shard = data_sharding(self.mesh, ndim=3)
        group_in_shard = stacked_data_sharding(self.mesh, ndim=3)
        group_lab_shard = stacked_data_sharding(self.mesh, ndim=2)
        def put(batch):
            out = dict(batch)
            if "group" in batch:
                out["labels"] = jax.device_put(batch["labels"], group_lab_shard)
                out["pcm"] = jax.device_put(batch["pcm"], group_in_shard)
                return out
            out["labels"] = jax.device_put(batch["labels"], lab_shard)
            if "feats" in batch:
                out["feats"] = jax.device_put(batch["feats"], feats_shard)
            else:
                out["pcm"] = jax.device_put(batch["pcm"], in_shard)
            return out

        for epoch in range(self.current_epoch + 1, epochs + 1):
            self.current_epoch = epoch
            margin = jnp.float32(self._margin_for_epoch(epoch))
            source = self.pipeline.epoch(epoch)
            if self.steps_per_dispatch > 1:
                source = _group_batches(source, self.steps_per_dispatch)
            last_log = step
            metrics = None
            # double-buffered H2D: batch N+1 transfers while step N runs
            for batch in device_prefetch(source, put):
                if "group" in batch:  # K stacked batches, one device program
                    state, metrics = self._train_step_group(
                        state, batch["pcm"], batch["labels"], margin
                    )
                    step += batch["group"]
                    metrics = {k: v[-1] for k, v in metrics.items()}
                    n_examples = batch["labels"].shape[1]
                elif "feats" in batch:  # kaldi-format precomputed features
                    state, metrics = self._train_step_feats(
                        state, batch["feats"], batch["labels"], margin
                    )
                    step += 1
                    n_examples = len(batch["labels"])
                else:
                    state, metrics = self._train_step(
                        state, batch["pcm"], batch["labels"], margin
                    )
                    step += 1
                    n_examples = len(batch["labels"])
                # metric fetches cost a device round-trip (~15 ms over this
                # rig's tunnel): fetch only on logging steps; the NaN guard
                # runs at the same cadence (plus the final step of the epoch)
                if log_every and step - last_log >= log_every:
                    last_log = step
                    loss = float(metrics["loss"])
                    guard.check(loss)
                    logger.log(
                        step,
                        examples=n_examples,
                        loss=loss,
                        acc=float(metrics["acc"]),
                        lr=float(self.schedule(step)),
                        epoch=epoch,
                        n_frames=batch["n_frames"],
                    )
            if metrics is None:
                raise RuntimeError(
                    f"epoch {epoch}: no batches produced — empty manifest "
                    "or misconfigured pipeline?"
                )
            guard.check(float(metrics["loss"]))  # end-of-epoch health check
            self.state = state
            # async: the ~seconds-long write overlaps the next epoch
            self.save(epoch, asynchronous=True)
        ckpt.wait_for_saves()
        logger.close()
        self.state = state
        return state

    # ------------------------------------------------------------------
    # checkpointing (layout ≙ exp/<log_time>/net_<epoch>)
    # ------------------------------------------------------------------
    def _tree(self, state: TrainState, epoch: int):
        # fetch_tree: one packed transfer per dtype instead of a device
        # round-trip per leaf (minutes -> seconds over high-latency links)
        return {
            "epoch": epoch,
            "params": ckpt.fetch_tree(state.params),
            "batch_stats": ckpt.fetch_tree(state.batch_stats),
            # optimizer state saved like the reference (train_audio.py:261-264);
            # restore is opt-in (the reference leaves it commented out, :271-273)
            "opt_state": ckpt.fetch_tree(state.opt_state),
        }

    def save(self, epoch: int | None = None, asynchronous: bool = False) -> None:
        state = self.ensure_state()
        epoch = epoch if epoch is not None else self.current_epoch
        ckpt.save_checkpoint(
            self.exp_dir, epoch, self._tree(state, epoch), asynchronous=asynchronous
        )

    def _restore_weights(self, tree) -> None:
        state = self.ensure_state()
        params = jax.device_put(tree["params"],
                                param_sharding(self.mesh, tree["params"]))
        stats = jax.device_put(tree["batch_stats"], replicated_sharding(self.mesh))
        self.state = TrainState(
            params=params,
            batch_stats=stats,
            opt_state=state.opt_state,
            step=state.step,
        )

    def load(self, path_or_tag: str, restore_optimizer: bool = False) -> None:
        """Resume weights + epoch; ``restore_optimizer`` additionally restores
        momentum/schedule state (default off — parity with the reference's
        commented-out optimizer restore, ``train_audio.py:266-274``)."""
        exp_dir, tag = os.path.split(path_or_tag.rstrip("/"))
        tree = ckpt.load_checkpoint(exp_dir or self.exp_dir, tag)
        self._restore_weights(tree)
        if restore_optimizer and tree.get("opt_state") is not None:
            state = self.ensure_state()
            leaves = jax.tree_util.tree_leaves(tree["opt_state"])
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(state.opt_state), leaves
            )
            self.state = TrainState(
                params=state.params,
                batch_stats=state.batch_stats,
                opt_state=jax.device_put(
                    opt_state, param_sharding(self.mesh, opt_state)),
                step=state.step,
            )
        self.current_epoch = int(tree.get("epoch", 0))
        if not restore_optimizer and self.current_epoch and self.pipeline:
            # fast-forward the step count so the step-based MultiStep LR
            # schedule resumes at the decayed rate (without this a crash
            # resume at epoch 20 trains epochs 21+ at undecayed init_lr);
            # scale_by_schedule's count lives in int scalar opt_state leaves
            resumed = self.current_epoch * self.pipeline.batches_per_epoch()
            state = self.ensure_state()

            def ff(x):
                if getattr(x, "ndim", None) == 0 and jnp.issubdtype(
                        jnp.asarray(x).dtype, jnp.integer):
                    return jnp.asarray(resumed, jnp.asarray(x).dtype)
                return x

            self.state = TrainState(
                params=state.params,
                batch_stats=state.batch_stats,
                opt_state=jax.tree.map(ff, state.opt_state),
                step=resumed,
            )
        self.exp_dir = exp_dir or self.exp_dir
        self.log_time = os.path.basename(self.exp_dir)

    def load_torch_checkpoint(self, path: str) -> None:
        """Load a reference PyTorch ``net_*.pth`` directly (migration path):
        converts the state_dict via ``interop.torch_import`` and installs the
        model weights + BN stats (criterion/optimizer keep their init)."""
        from deeplip_tpu.interop.torch_import import load_reference_audio_checkpoint

        params, stats = load_reference_audio_checkpoint(
            path, n_blocks=len(self.model.contexts)
        )
        state = self.ensure_state()
        new_params = dict(state.params)
        new_params["model"] = params
        self.state = TrainState(
            params=jax.device_put(new_params, replicated_sharding(self.mesh)),
            batch_stats=jax.device_put({"model": stats}, replicated_sharding(self.mesh)),
            opt_state=state.opt_state,
            step=state.step,
        )

    def load_finetune(self, path_or_tag: str) -> None:
        """Load the BACKBONE weights only, keep epoch at 0; the optimizer
        mask (set from ``train_type: finetune``) freezes the backbone like
        ``train_audio.py:276-296``. The criterion/classifier keeps its fresh
        init — the reference likewise reloads only the model, so finetuning
        onto a different speaker count works."""
        exp_dir, tag = os.path.split(path_or_tag.rstrip("/"))
        tree = ckpt.load_checkpoint(exp_dir or self.exp_dir, tag)
        state = self.ensure_state()
        new_params = dict(state.params)
        new_params["model"] = tree["params"]["model"]
        self.state = TrainState(
            params=jax.device_put(new_params,
                                  param_sharding(self.mesh, new_params)),
            batch_stats=jax.device_put(tree["batch_stats"],
                                       replicated_sharding(self.mesh)),
            opt_state=state.opt_state,
            step=state.step,
        )

    def model_average(self, avg_num: int = 4) -> None:
        """Average the last N epoch checkpoints into ``net_avg`` and load it
        (≙ ``train_audio.py:216-232``)."""
        epochs = [self.current_epoch - i for i in range(avg_num)]
        epochs = [e for e in epochs if e >= 1]
        tree = ckpt.average_checkpoints(self.exp_dir, epochs)
        self._restore_weights(tree)

    # ------------------------------------------------------------------
    # embedding extraction + scoring
    # ------------------------------------------------------------------
    def _embed_fn(self):
        # TPU f32 matmuls default to single-pass bf16 (~8e-4 embedding error,
        # violating the 1e-4 parity bar); 'high' (bf16_3x) is ~3e-6 at ~1.4x
        # cost. Training keeps the fast default; extraction is precise.
        #
        # 'tuned' applies the measured per-op budget
        # (benchmarks/precision_budget.py, docs/precision_budget_r03.md):
        # in the trained-weight regime EVERY matmul class needs >= 'high'
        # to hold the 1e-4 bar (DSP at bf16 costs 7.4e-4, the FC head
        # 3.0e-4, the convs jointly 1.6e-4, and 2-pass compensated splits
        # recover only ~1.5x — the cheaper r3 candidate measured 8.9e-4,
        # docs/parity_full_r03_rejected_wsplit2.json, and was rejected). 'tuned' is
        # therefore 'high' EVERYWHERE, including the DSP basis matmuls the
        # default FeatureConfig runs at 'highest' (6-pass) for no measured
        # accuracy gain (2.56e-5 vs 2.47e-5). Gated end-to-end by
        # scripts/parity_check.py --full --precision tuned.
        precision = self.test_opts.get("matmul_precision", "high")
        model, eval_feat_cfg, ctx = self.model, self.eval_feat_cfg, precision
        if precision == "tuned":
            import dataclasses as _dc

            ctx = "high"
            eval_feat_cfg = _dc.replace(eval_feat_cfg, precision="high")

        @jax.jit
        def embed(params, batch_stats, pcm, feat_lengths, sample_lengths):
            if pcm.dtype == jnp.int16:
                # int16 transport (EvalUtteranceSet(transport="int16")):
                # half the H2D bytes; the exact power-of-two rescale feeds
                # the model the same f32 PCM values on PCM16 sources
                pcm = pcm.astype(jnp.float32) / 32768.0
            with jax.default_matmul_precision(ctx):
                feats = F.extract_features(
                    pcm, eval_feat_cfg, backend=self.feature_backend,
                    sample_lengths=sample_lengths,
                )
                if eval_feat_cfg.feat_type == "stft":
                    # librosa's column count is 1 + L//hop (datasets.py:
                    # 73-76); the pipeline's feat_lengths use the psf
                    # num_frames convention (the bucketing currency), which
                    # under-counts stft columns by ~n_fft/(2·hop)-ish —
                    # recompute the true valid-frame count in-graph so
                    # masked CMVN/pooling see every reference frame (r5,
                    # stft bucketed-eval exactness)
                    hop = int(eval_feat_cfg.rate * eval_feat_cfg.win_shift)
                    feat_lengths = jnp.minimum(
                        1 + sample_lengths // hop, feats.shape[-2])
                if self.feat_cfg.normalize:
                    feats = masked_cmvn(feats, feat_lengths)
                if self.feat_cfg.delta:
                    feats = F.add_deltas(feats, order=2)
                xv, x_a = model.apply(
                    {"params": params["model"], "batch_stats": batch_stats["model"]},
                    feats,
                    lengths=feat_lengths,
                    method=model.extract_embedding,
                )
                if self.loss_name == "CrossEntropy":
                    # CE embeds with the fc1 pre-activation (train_audio.py:316-317)
                    return x_a
                # margin systems embed with normalized fc2 (train_audio.py:318-320)
                return xv / jnp.linalg.norm(xv, axis=-1, keepdims=True).clip(1e-12)

        return embed

    def extract_embeddings(self, utterances: EvalUtteranceSet) -> EmbeddingStore:
        state = self.ensure_state()
        if "embed" not in self._embed_fns:
            self._embed_fns["embed"] = self._embed_fn()
        embed = self._embed_fns["embed"]
        store = EmbeddingStore()
        in_shard = data_sharding(self.mesh, ndim=2)
        len_shard = data_sharding(self.mesh, ndim=1)

        def stage(batch):
            """Pad to mesh divisibility and ENQUEUE the host→device
            transfers (``device_put`` is asynchronous): staged one batch
            ahead below, the next batch's PCM ships while the current one
            computes and its embeddings fetch — on transport-bound links
            (this rig's relay; to a lesser degree PCIe) the transfer is
            the extraction wall-clock, so the overlap is direct savings."""
            pcm, lengths, names = batch["pcm"], batch["feat_lengths"], batch["names"]
            slen = batch["sample_lengths"]
            pad = -len(names) % self.n_devices
            if pad:
                pcm = np.concatenate([pcm, np.zeros((pad,) + pcm.shape[1:], pcm.dtype)])
                lengths = np.concatenate([lengths, np.ones((pad,), lengths.dtype)])
                slen = np.concatenate([slen, np.ones((pad,), slen.dtype)])
            return names, (
                jax.device_put(pcm, in_shard),
                jax.device_put(lengths, len_shard),
                jax.device_put(slen, len_shard),
            )

        pending = None
        batches = utterances.batches()
        for batch in batches:
            staged = stage(batch)
            if pending is not None:
                names, args = pending
                out = np.asarray(embed(state.params, state.batch_stats, *args))
                for i, name in enumerate(names):
                    store[name] = out[i]
            pending = staged
        if pending is not None:
            names, args = pending
            out = np.asarray(embed(state.params, state.batch_stats, *args))
            for i, name in enumerate(names):
                store[name] = out[i]
        return store

    def evaluate(self, trial_path: str, store: EmbeddingStore) -> tuple[float, float]:
        return cosine_eer(TrialList.load(trial_path), store)
