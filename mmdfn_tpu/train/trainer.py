"""Training/eval engine: jitted functional steps + reference-parity epoch loop.

Rebuilds the reference trainer layer (``code/run_train_erc.py:92-238,554-644``)
TPU-first:

* The whole train step — forward, loss, backward, Adam update — is ONE jitted
  function; XLA fuses the entire graph and keeps everything on-chip.  The
  reference runs eager per-op CUDA kernels with a per-batch H2D boundary.
* Static shapes via length-bucketed batches: jit caches one executable per
  bucket, so an epoch touches a handful of compilations, then is pure compute.
* Data parallelism: pass a ``Mesh`` and batches are sharded on the dialogue
  axis (params replicated); XLA inserts the gradient ``psum`` over ICI.  The
  adjacency is block-diagonal per dialogue so DP is exact — no semantic drift
  from the single-chip run.
* Buffer donation on params/opt-state avoids a full parameter copy per step.

Reference-parity details reproduced exactly:
* modality concat dispatch before the forward (``run_train_erc.py:170-199``);
* graph-path loss = mean over valid utterances, epoch loss = mean of batch
  losses (``run_train_erc.py:202,222``); non-graph epoch loss = utterance-
  weighted (``run_train_erc.py:116,137``);
* metrics identical to the sklearn calls (``run_train_erc.py:229-236``);
* dual-patience early stopping and the ``valid_rate==0`` -> select-on-test
  rule (``run_train_erc.py:609-638``);
* per-epoch RNG reseed quirk (``run_train_erc.py:164``) as a faithful-mode
  option (same dropout key stream every epoch).
"""

from __future__ import annotations

import dataclasses
import json
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from mmdfn_tpu.config import ExperimentConfig
from mmdfn_tpu.data.batching import Batch, BucketBatcher
from mmdfn_tpu.losses import focal_loss, masked_nll_loss
from mmdfn_tpu.models.dialogue_gnn import DialogueGNN
from mmdfn_tpu.runtime import checkpoint as ckpt_lib
from mmdfn_tpu.runtime.mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding,
                                    replicate)
from mmdfn_tpu.train import metrics as M
from mmdfn_tpu.train.optim import torch_adam


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


@dataclass
class EpochMetrics:
    """One epoch's aggregate metrics (reference print contract)."""

    loss: float
    acc: float
    fscore: float
    labels: np.ndarray
    preds: np.ndarray
    report: str = ""
    per_class_acc: List[str] = field(default_factory=list)
    throughput: Dict = field(default_factory=dict)


@dataclass
class FitResult:
    state: TrainState
    best_epoch: int
    best_eval_fscore: float
    best_test_acc: float
    best_test_fscore: float
    all_test_fscore: List[float]
    all_test_acc: List[float]
    history: List[Dict] = field(default_factory=list)


def prepare_inputs(cfg: ExperimentConfig, batch: Batch) -> Dict[str, jnp.ndarray]:
    """Modality selection/concat dispatch (``run_train_erc.py:170-199``).

    The dispatch lives in the reference's *graph* epoch driver only; the
    non-graph driver feeds raw text features (``run_train_erc.py:107``).
    """
    text, audio, visual = batch.text, batch.audio, batch.visual
    if not cfg.graph_model:
        pass
    elif cfg.multi_modal:
        if cfg.mm_fusion_mthd == "concat":
            order = {"avl": (audio, visual, text), "av": (audio, visual),
                     "vl": (visual, text), "al": (audio, text)}
            if cfg.modals not in order:
                raise NotImplementedError(cfg.modals)
            text = np.concatenate(order[cfg.modals], axis=-1)
    else:
        text = {"a": audio, "v": visual, "l": text}[cfg.modals]
    tdt = jnp.bfloat16 if cfg.transfer_dtype == "bfloat16" else jnp.float32
    feat = lambda x: jnp.asarray(np.asarray(x, dtype=tdt))
    return dict(
        text=feat(text), audio=feat(audio), visual=feat(visual),
        qmask=jnp.asarray(batch.qmask),
        umask=jnp.asarray(batch.umask), label=jnp.asarray(batch.label))


class Trainer:
    """Functional trainer for the DialogueGNN model family."""

    def __init__(self, cfg: ExperimentConfig, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            n_data = mesh.shape[DATA_AXIS]
            if cfg.batch_size % n_data != 0:
                raise ValueError(
                    f"batch_size={cfg.batch_size} must be divisible by the "
                    f"mesh data axis ({n_data} devices) — every collated "
                    "batch is padded to exactly batch_size dialogues")
        self.model = self._build_model(cfg, mesh)
        self.tx = torch_adam(cfg.lr, weight_decay=cfg.l2)
        alpha = cfg.class_weights_or_none()
        self.alpha = None if alpha is None else jnp.asarray(alpha)
        self.loss_kind = ("focal" if (cfg.graph_model and cfg.loss == "FocalLoss")
                          else "nll")
        # --tensorboard reproduces the reference's per-batch per-parameter
        # gradient histograms (run_train_erc.py:120-122,209-211), reduced
        # on-device inside the jitted step (see profiling.grad_histograms_device)
        self.grad_hist_bins = 64 if cfg.tensorboard else 0
        # callback (global_step, {param: hist-dict of host arrays}) — set by
        # the CLI to a tensorboardX writer; epochs buffer device-side and
        # flush at the end-of-epoch sync so dispatch stays asynchronous
        self.grad_hist_sink = None
        self._train_step, self._eval_step = self._build_steps()

    # ------------------------------------------------------------------
    @staticmethod
    def _build_model(cfg: ExperimentConfig, mesh=None):
        """Model assembly mirroring ``run_train_erc.py:416-487``."""
        if cfg.graph_model:
            gcn_spmm = None
            if mesh is not None and dict(mesh.shape).get(MODEL_AXIS, 1) > 1:
                # tensor parallelism: the GCNII stack's per-layer adj@h
                # runs node-sharded over the mesh model axis (one
                # psum_scatter per layer; parallel/graph_parallel.py)
                from mmdfn_tpu.parallel.graph_parallel import (
                    sharded_spmm_batched)
                gcn_spmm = partial(sharded_spmm_batched, mesh)
            return DialogueGNN.from_config(cfg, gcn_spmm=gcn_spmm)
        from mmdfn_tpu.config import D_A, D_E, D_G, D_H, D_P
        from mmdfn_tpu.models.baselines import (DialogRNNModel, GRUModel,
                                                LSTMModel)
        info = cfg.info
        if cfg.base_model == "GRU":
            return GRUModel(cfg.D_m, D_E, D_H, n_classes=info["n_classes"],
                            dropout=cfg.dropout)
        if cfg.base_model == "LSTM":
            return LSTMModel(cfg.D_m, D_E, D_H, n_classes=info["n_classes"],
                             dropout=cfg.dropout)
        if cfg.base_model == "DialogRNN":
            return DialogRNNModel(
                cfg.D_m, D_G, D_P, D_E, D_H, D_a=D_A,
                n_classes=info["n_classes"],
                listener_state=cfg.active_listener,
                context_attention=cfg.attention,
                dropout_rec=cfg.rec_dropout, dropout=cfg.dropout)
        raise ValueError(f"unknown base_model {cfg.base_model!r} for "
                         "graph_model=False")

    # ------------------------------------------------------------------
    # Model-family hooks: subclasses with a different input signature
    # (e.g. DailyTrainer's token-id batches) override these four.
    def _apply_model(self, params, batch, deterministic, rngs=None,
                     **apply_kw):
        return self.model.apply(
            {"params": params}, batch["text"], batch["qmask"],
            batch["umask"], batch["audio"], batch["visual"],
            deterministic=deterministic, rngs=rngs, **apply_kw)

    def _init_variables(self, rng, example):
        return self.model.init(
            rng, example["text"], example["qmask"], example["umask"],
            example["audio"], example["visual"], deterministic=True)

    def _example_inputs(self) -> Dict[str, jnp.ndarray]:
        cfg, info = self.cfg, self.cfg.info
        B, L = 2, 8
        return dict(
            text=jnp.zeros((B, L, cfg.D_m)),
            audio=jnp.zeros((B, L, info["D_audio"])),
            visual=jnp.zeros((B, L, info["D_visual"])),
            qmask=jnp.zeros((B, L, info["n_speakers"])),
            umask=jnp.ones((B, L)),
            label=jnp.zeros((B, L), jnp.int32))

    def _prepare(self, batch) -> Dict[str, jnp.ndarray]:
        return prepare_inputs(self.cfg, batch)

    def _make_batcher(self, dialogues, shuffle: bool = False) -> BucketBatcher:
        cfg = self.cfg
        return BucketBatcher(
            dialogues, cfg.batch_size, cfg.info["n_speakers"], cfg.buckets,
            shuffle=shuffle, seed=cfg.seed,
            sort_by_length=cfg.sort_batches_by_length if shuffle else False)

    # ------------------------------------------------------------------
    def init_state(self, seed: Optional[int] = None,
                   example: Optional[Dict[str, jnp.ndarray]] = None) -> TrainState:
        cfg = self.cfg
        if example is None:
            example = self._example_inputs()
        rng = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        variables = self._init_variables(rng, example)
        params = variables["params"]
        state = TrainState(params=params, opt_state=self.tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            state = replicate(self.mesh, state)
        return state

    # ------------------------------------------------------------------
    def _loss(self, log_probs, label, umask):
        if self.loss_kind == "focal":
            return focal_loss(log_probs, label, umask, gamma=self.cfg.gamma,
                              alpha=self.alpha)
        return masked_nll_loss(log_probs, label, umask, weight=self.alpha)

    def _build_steps(self):
        cfg = self.cfg

        def forward(params, batch, deterministic, rng):
            if (cfg.rng_impl and rng is not None and not deterministic):
                # re-wrap the (2,) uint32 threefry key as an rbg key: bits
                # then come from the TPU hardware RNG (cheap) instead of
                # threefry lowering (~2.3 ms/step of VPU work at the
                # flagship's 19 per-layer dropout masks); draws differ but
                # stay deterministic per seed
                rng = jax.random.wrap_key_data(
                    jnp.tile(jax.random.key_data(rng)
                             if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
                             else rng, 2)[:4], impl=cfg.rng_impl)
            rngs = None if deterministic else {"dropout": rng}
            return self._apply_model(params, batch, deterministic, rngs)

        def loss_fn(params, batch, rng):
            logp = forward(params, batch, False, rng)
            return self._loss(logp, batch["label"], batch["umask"]), logp

        hist_bins = self.grad_hist_bins

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, rng):
            (loss, logp), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch, rng)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            new = TrainState(params=params, opt_state=opt_state,
                             step=state.step + 1)
            if hist_bins:
                from mmdfn_tpu.runtime.profiling import grad_histograms_device
                hists = grad_histograms_device(grads, bins=hist_bins)
                return new, loss, jnp.argmax(logp, axis=-1), hists
            return new, loss, jnp.argmax(logp, axis=-1)

        @jax.jit
        def eval_step(params, batch):
            logp = forward(params, batch, True, None)
            loss = self._loss(logp, batch["label"], batch["umask"])
            return loss, jnp.argmax(logp, axis=-1)

        if cfg.matmul_precision:
            # Scope the precision to this trainer's steps instead of mutating
            # process-global jax config (which would leak into other trainers
            # in a one-process sweep).  The context enters the jit trace key,
            # so executables cache correctly per precision.
            def scoped(fn):
                def wrapped(*a, **k):
                    with jax.default_matmul_precision(cfg.matmul_precision):
                        return fn(*a, **k)
                return wrapped
            train_step, eval_step = scoped(train_step), scoped(eval_step)

        return train_step, eval_step

    # ------------------------------------------------------------------
    def _epoch_key(self, epoch: int) -> jax.Array:
        base = jax.random.PRNGKey(self.cfg.seed)
        if self.cfg.faithful_epoch_reseed:
            return base  # reference reseeds identically every epoch (:164)
        return jax.random.fold_in(base, epoch)

    def _put(self, inputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        if self.mesh is None:
            return inputs
        s = batch_sharding(self.mesh)
        return {k: jax.device_put(v, s) for k, v in inputs.items()}

    def run_epoch(self, state: TrainState, batches: Sequence[Batch],
                  train: bool = False, epoch: int = 0,
                  full_report: bool = False) -> Tuple[TrainState, EpochMetrics]:
        """One pass over ``batches``; mirrors ``train_or_eval_graph_model``."""
        from mmdfn_tpu.runtime.profiling import ThroughputMeter

        cfg = self.cfg
        losses, mask_sums = [], []
        all_labels, all_preds = [], []
        hist_rows = []
        key = self._epoch_key(epoch)
        meter = ThroughputMeter()
        meter.start()
        n_dia_total = n_utt_total = 0
        # Fully asynchronous dispatch: device_put (H2D) and the jitted steps
        # are all enqueued without host syncs, so transfers of batch i+1
        # overlap compute of batch i (H2D is the bottleneck on slow links —
        # measured 15ms compute vs 1.7s synchronous transfer per flagship
        # batch over a tunneled chip).  Loss/pred device->host conversion
        # happens once at epoch end.
        for i, item in enumerate(batches):
            # eval splits are prepared+transferred once in fit(); train
            # batches (reshuffled each epoch) arrive as raw Batch objects
            if isinstance(item, tuple):
                batch, inputs = item
            else:
                batch = item
                inputs = self._put(self._prepare(batch))
            n_dia_total += int((batch.umask.sum(-1) > 0).sum())
            n_utt_total += batch.n_valid
            if train:
                out = self._train_step(state, inputs,
                                       jax.random.fold_in(key, i))
                if self.grad_hist_bins:
                    state, loss, preds, hists = out
                    hist_rows.append(hists)     # device arrays; no sync here
                else:
                    state, loss, preds = out
            else:
                loss, preds = self._eval_step(state.params, inputs)
            m = batch.umask.reshape(-1) > 0
            all_labels.append(batch.label.reshape(-1)[m])
            all_preds.append((preds, m))
            losses.append(loss)
            mask_sums.append(float(m.sum()))
        # epoch-end sync: enqueue ALL D2H copies first so the transfers
        # pipeline, then read — per-item float()/np.asarray() alone would
        # pay one blocking round-trip per batch over a tunneled chip
        for l in losses:
            if hasattr(l, "copy_to_host_async"):
                l.copy_to_host_async()
        for p, _ in all_preds:
            if hasattr(p, "copy_to_host_async"):
                p.copy_to_host_async()
        for hists in hist_rows:
            jax.tree_util.tree_map(
                lambda a: a.copy_to_host_async()
                if hasattr(a, "copy_to_host_async") else None, hists)
        losses = [float(l) for l in losses]
        all_preds = [np.asarray(p).reshape(-1)[m] for p, m in all_preds]
        meter.stop(n_dia_total, n_utt_total)
        if hist_rows and self.grad_hist_sink is not None:
            # per-batch global step numbers reconstructed from the final
            # post-epoch step counter (state.step advanced once per batch)
            last = int(state.step)
            for k, hists in enumerate(hist_rows):
                step_no = last - len(hist_rows) + k + 1
                self.grad_hist_sink(
                    step_no, jax.tree_util.tree_map(np.asarray, hists))
        if not all_labels:
            nan = float("nan")
            empty = np.zeros((0,), np.int32)
            return state, EpochMetrics(nan, nan, nan, empty, empty)
        labels = np.concatenate(all_labels)
        preds = np.concatenate(all_preds)
        if cfg.graph_model:
            avg_loss = round(float(np.sum(losses) / len(losses)), 4)
        else:
            weighted = np.asarray(losses) * np.asarray(mask_sums)
            avg_loss = round(float(np.sum(weighted) / np.sum(mask_sums)), 4)
        n_classes = cfg.info["n_classes"]
        acc = round(M.accuracy(labels, preds) * 100, 2)
        fscore = round(M.f1_score(labels, preds, n_classes) * 100, 2)
        result = EpochMetrics(avg_loss, acc, fscore, labels, preds,
                              throughput=meter.summary())
        if full_report:
            names = cfg.info["target_names"]
            result.report = M.classification_report(labels, preds, names)
            result.per_class_acc = M.per_class_accuracy(labels, preds, names)
        return state, result

    # ------------------------------------------------------------------
    def fit(self, train_dialogues, test_dialogues, valid_dialogues=(),
            state: Optional[TrainState] = None, verbose: bool = True,
            log_path: Optional[str] = None,
            save_dir: Optional[str] = None,
            resume: bool = False) -> FitResult:
        """Full training run with the reference's selection/early-stop rules.

        ``resume=True`` restores the per-epoch 'last' checkpoint from
        ``save_dir`` (params + opt state + selection counters) and continues
        from the next epoch — preemption recovery the reference lacks
        (SURVEY.md §5.3/§5.4).
        """
        cfg = self.cfg
        train_batcher = self._make_batcher(train_dialogues, shuffle=True)
        # fixed eval splits: convert + transfer to device ONCE, not per epoch
        prep = lambda b: (b, self._put(self._prepare(b)))
        valid_batches = [prep(b) for b in self._make_batcher(valid_dialogues)]
        test_batches = [prep(b) for b in self._make_batcher(test_dialogues)]
        if state is None:
            state = self.init_state()

        best_epoch, best_eval_fscore = -1, None
        best_eval_loss, best_epoch2 = None, -1
        patience = patience2 = 0
        all_test_fscore: List[float] = []
        all_test_acc: List[float] = []
        history: List[Dict] = []
        best_state = state
        start_epoch = 0
        can_resume = bool(resume and save_dir
                          and ckpt_lib.has_checkpoint(save_dir, name="last"))
        if resume and not can_resume:
            print("resume requested but no 'last' checkpoint under "
                  f"{save_dir!r} — starting fresh")
        if can_resume:
            # refuse to continue under a different configuration: silently
            # training restored params with new hyperparameters is neither
            # the old run nor a fresh one (epochs may grow; runtime-only
            # fields are exempt)
            saved_cfg = ckpt_lib.read_meta(save_dir, "last").get("config")
            if saved_cfg:
                exempt = {"epochs", "log_jsonl", "save_model_dir",
                          "test_label", "load_model", "tensorboard"}
                now = dataclasses.asdict(cfg)
                diff = {k for k, v in saved_cfg.items()
                        if k in now and k not in exempt
                        and (tuple(v) if isinstance(v, list) else v) != now[k]}
                if diff:
                    raise ValueError(
                        "resume config mismatch on fields "
                        f"{sorted(diff)}; restart fresh or restore the "
                        "original flags")
            state, meta = ckpt_lib.restore_checkpoint(save_dir, state,
                                                      name="last")
            if self.mesh is not None:
                # restore yields host numpy leaves; place them back as
                # mesh-replicated state explicitly (donation + collectives
                # assume committed placement, not jit auto-placement)
                state = replicate(self.mesh, state)
            r = meta.get("resume", {})
            start_epoch = int(r.get("epoch", -1)) + 1
            best_epoch = int(r.get("best_epoch", -1))
            best_eval_fscore = r.get("best_eval_fscore")
            best_eval_loss = r.get("best_eval_loss")
            best_epoch2 = int(r.get("best_epoch2", -1))
            patience = int(r.get("patience", 0))
            patience2 = int(r.get("patience2", 0))
            all_test_fscore = list(r.get("all_test_fscore", []))
            all_test_acc = list(r.get("all_test_acc", []))
            history = list(r.get("history", []))
            if ckpt_lib.has_checkpoint(save_dir, name="best"):
                best_state, _ = ckpt_lib.restore_checkpoint(
                    save_dir, self.init_state(), name="best")
            if patience >= cfg.patience and patience2 >= cfg.patience:
                # the run had already early-stopped; don't train further
                start_epoch = cfg.epochs
            if verbose:
                print(f"resumed from epoch {start_epoch - 1} "
                      f"(best_epoch={best_epoch})")
        log_f = open(log_path, "a") if log_path else None

        for e in range(start_epoch, cfg.epochs):
            t0 = time.time()
            state, tr = self.run_epoch(state, list(train_batcher.epoch(e)),
                                       train=True, epoch=e)
            _, va = self.run_epoch(state, valid_batches, epoch=e)
            _, te = self.run_epoch(state, test_batches, epoch=e,
                                   full_report=verbose)
            all_test_fscore.append(te.fscore)
            all_test_acc.append(te.acc)
            # selection split: valid when valid_rate>0, else test (:609-612)
            eval_loss, eval_fscore = ((va.loss, va.fscore)
                                      if cfg.valid_rate > 0
                                      else (te.loss, te.fscore))
            if e == 0 or (best_eval_fscore is not None
                          and best_eval_fscore < eval_fscore):
                patience = 0
                best_epoch, best_eval_fscore = e, eval_fscore
                # host copy: the live state's device buffers get donated to
                # the next train_step and would otherwise be invalidated
                best_state = jax.tree_util.tree_map(np.asarray, state)
                if save_dir:
                    ckpt_lib.save_checkpoint(
                        save_dir, state,
                        meta=dict(epoch=e, eval_fscore=eval_fscore,
                                  config=dataclasses.asdict(cfg)))
            else:
                patience += 1
            if best_eval_loss is None:
                best_eval_loss, best_epoch2 = eval_loss, 0
            elif eval_loss < best_eval_loss:
                best_epoch2, best_eval_loss = e, eval_loss
                patience2 = 0
            else:
                patience2 += 1

            row = dict(epoch=e, train_loss=tr.loss, train_acc=tr.acc,
                       train_fscore=tr.fscore, valid_loss=va.loss,
                       valid_acc=va.acc, valid_fscore=va.fscore,
                       test_loss=te.loss, test_acc=te.acc,
                       test_fscore=te.fscore,
                       time=round(time.time() - t0, 2),
                       train_dps=tr.throughput.get("dialogues_per_sec"),
                       train_ups=tr.throughput.get("utterances_per_sec"))
            history.append(row)
            if verbose:
                print("epoch: {epoch}, train_loss: {train_loss}, train_acc: "
                      "{train_acc}, train_fscore: {train_fscore}, valid_loss: "
                      "{valid_loss}, valid_acc: {valid_acc}, valid_fscore: "
                      "{valid_fscore}, test_loss: {test_loss}, test_acc: "
                      "{test_acc}, test_fscore: {test_fscore}, time: {time} "
                      "sec".format(**row))
                print(te.report)
                print(te.per_class_acc)
            if log_f:
                log_f.write(json.dumps(row) + "\n")
                log_f.flush()
            if save_dir:
                ckpt_lib.save_checkpoint(
                    save_dir, state, name="last",
                    meta=dict(config=dataclasses.asdict(cfg), resume=dict(
                        epoch=e, best_epoch=best_epoch,
                        best_eval_fscore=best_eval_fscore,
                        best_eval_loss=(None if best_eval_loss is None
                                        else float(best_eval_loss)),
                        best_epoch2=best_epoch2, patience=patience,
                        patience2=patience2,
                        all_test_fscore=all_test_fscore,
                        all_test_acc=all_test_acc, history=history)))
            if patience >= cfg.patience and patience2 >= cfg.patience:
                if verbose:
                    print("Early stoping...", patience, patience2)
                break

        if log_f:
            log_f.close()
        if verbose:
            print("Final Test performance...")
            print("Eval-metric: F1, Epoch: {}, best_eval_fscore: {}, "
                  "Accuracy: {}, F1-Score: {}".format(
                      best_epoch, best_eval_fscore,
                      all_test_acc[best_epoch] if best_epoch >= 0 else 0,
                      all_test_fscore[best_epoch] if best_epoch >= 0 else 0))
        return FitResult(
            state=best_state, best_epoch=best_epoch,
            best_eval_fscore=best_eval_fscore or 0.0,
            best_test_acc=all_test_acc[best_epoch] if best_epoch >= 0 else 0.0,
            best_test_fscore=(all_test_fscore[best_epoch]
                              if best_epoch >= 0 else 0.0),
            all_test_fscore=all_test_fscore, all_test_acc=all_test_acc,
            history=history)

    # ------------------------------------------------------------------
    def evaluate(self, state: TrainState, dialogues) -> EpochMetrics:
        batches = list(self._make_batcher(dialogues))
        _, m = self.run_epoch(state, batches, full_report=True)
        return m

    def dump_activations(self, state: TrainState, dialogues,
                         out_path: str) -> str:
        """Save every module's intermediate activations for the first eval
        batch — the build-side equivalent of the reference's ``test_label``
        per-layer npy dumps (``model_GCN.py:474-480``, ``model.py:1297-1301``).

        Written as one ``.npz`` keyed by flax module path.
        """
        batch = next(iter(self._make_batcher(dialogues)))
        inputs = self._prepare(batch)
        _, mods = self._apply_model(
            state.params, inputs, True, capture_intermediates=True,
            mutable=["intermediates"])
        flat = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                mods["intermediates"]):
            name = jax.tree_util.keystr(path).strip("[]'").replace(
                "']['", "/")
            flat[name] = np.asarray(leaf)
        np.savez(out_path, **flat)
        return out_path
