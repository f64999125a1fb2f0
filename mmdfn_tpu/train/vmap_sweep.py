"""Vmapped multi-config training: many hyperparameter combos on one chip.

The reference sweeps hyperparameters with nested bash loops running one
process per combo sequentially (``script/run_train_ie.sh:26-60``).  The
MM-DFN model is tiny (~1-2M params), so a single TPU chip can train MANY
combos *simultaneously*: stack the parameters of K configs along a leading
axis and ``jax.vmap`` the whole train step.  Every matmul becomes K-times
batched — exactly what the MXU wants — and one compiled executable sweeps
the entire group.

What can stack: anything that enters the step as *data* — learning rate, L2
coefficient, focal gamma, and the DROPOUT RATE (a bernoulli threshold: the
traced per-config rate rides to every cfg.dropout-derived site through
:mod:`mmdfn_tpu.nn.drop_override`, including the fused GCNII kernel's
in-kernel PRNG threshold, and both reference grids vary it —
``run_train_ie.sh`` dp {0.2, 0.4}).  What cannot: flags that change
parameter shapes or trace structure (``Deep_GCN_nlayers``, graph_type).
The sweep grid is therefore partitioned into static groups; each group
trains as one vmapped run (IEMOCAP's 32-combo grid = 2 groups of 16, one
per layer count).

Early stopping is per-config via an update *freeze mask*: a stopped config's
parameter updates are multiplied by zero (same math as stopping, no ragged
control flow), and the group stops when every config is frozen.

Multi-chip: pass a ``Mesh`` and the stacked config axis K is sharded over the
mesh's data axis — each device trains its slice of the hyperparameter grid
(config parallelism).  The batch is replicated, every config's step is
independent, so there are ZERO collectives in the step; scaling is linear in
devices up to K.  This is the idiomatic pod-scale replacement for the
reference's sequential bash grid (``script/run_train_ie.sh:26-60``).
"""

from __future__ import annotations

import dataclasses
import itertools
import json
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmdfn_tpu.config import ExperimentConfig
from mmdfn_tpu.data.batching import BucketBatcher
from mmdfn_tpu.losses import focal_loss
from mmdfn_tpu.train import metrics as M
from mmdfn_tpu.train.trainer import Trainer, prepare_inputs



def _canon_combos(combos):
    """Checkpoint-identity form of a combo list: the saved meta rides a
    JSON round-trip (tuples -> lists, ints -> the JSON number model), so
    the wrong-group check must compare in that canonical form or a
    tuple-valued combo key (e.g. buckets) never matches its own save."""
    return json.loads(json.dumps(list(combos)))


@dataclass
class GroupResult:
    """Per-config outcomes of one vmapped group run."""

    combos: List[dict]
    best_epoch: List[int]
    best_test_fscore: List[float]
    best_test_acc: List[float]
    history: List[List[dict]]           # [config][epoch] metric rows


def group_combos(combos: Sequence[dict],
                 static_keys: Sequence[str] = ("Deep_GCN_nlayers",)
                 ) -> List[Tuple[dict, List[dict]]]:
    """Partition combos by the hyperparameters that must stay static."""
    groups: Dict[tuple, List[dict]] = {}
    for c in combos:
        key = tuple((k, c[k]) for k in static_keys if k in c)
        groups.setdefault(key, []).append(c)
    return [(dict(k), v) for k, v in groups.items()]


def _adam_init(params):
    zeros = lambda p: jnp.zeros_like(p)
    return (jax.tree_util.tree_map(zeros, params),
            jax.tree_util.tree_map(zeros, params),
            jnp.zeros((), jnp.float32))


def _adam_update(grads, state, params, lr, l2, freeze):
    """torch-semantics Adam (coupled L2) with per-config lr/l2 scalars and a
    freeze flag that turns the update into a no-op (early-stopped config)."""
    m, v, t = state
    t = t + (1.0 - freeze)              # frozen configs do not advance t
    b1, b2, eps = 0.9, 0.999, 1e-8

    def upd(g, p, m_, v_):
        g = g + l2 * p
        m2 = b1 * m_ + (1 - b1) * g
        v2 = b2 * v_ + (1 - b2) * g * g
        mhat = m2 / (1 - b1 ** t)
        vhat = v2 / (1 - b2 ** t)
        step = lr * mhat / (jnp.sqrt(vhat) + eps)
        keep = 1.0 - freeze
        return p - keep * step, m_ + keep * (m2 - m_), v_ + keep * (v2 - v_)

    out = jax.tree_util.tree_map(upd, grads, params,
                                 *(m, v))
    new_params = jax.tree_util.tree_map(lambda x: x[0], out,
                                        is_leaf=lambda x: isinstance(x, tuple))
    new_m = jax.tree_util.tree_map(lambda x: x[1], out,
                                   is_leaf=lambda x: isinstance(x, tuple))
    new_v = jax.tree_util.tree_map(lambda x: x[2], out,
                                   is_leaf=lambda x: isinstance(x, tuple))
    return new_params, (new_m, new_v, t)


class VmapSweep:
    """Train K same-shape configs simultaneously via stacked parameters."""

    def __init__(self, base_cfg: ExperimentConfig, combos: Sequence[dict],
                 mesh=None):
        # only lr/l2/gamma/dropout can be stacked along the vmapped config
        # axis (they enter the step as per-config scalars — dropout as the
        # traced rate override, nn/drop_override.py); any other key must be
        # identical across the group — fold it into the shared config.  A
        # key that VARIES outside the stackable set would otherwise train K
        # copies of the base value while reporting the asked-for grid:
        # silently wrong sweep science, so refuse loudly.  The override is
        # only consulted by DialogueGNN's cfg.dropout-derived sites (the
        # rate_tag wiring), so for non-graph baseline configs a stacked
        # rate would be silently ignored — there dropout is a static key
        # instead (identical -> folded, varying -> refused).
        STACKABLE = (("lr", "l2", "gamma", "dropout")
                     if base_cfg.graph_model else ("lr", "l2", "gamma"))
        static = {}
        keys = {k for c in combos for k in c}
        for k in keys:
            vals = [c.get(k) for c in combos]
            if k in STACKABLE:
                # gamma/dropout fall back to the base config; lr/l2 must be
                # present in EVERY combo or the stack build below dies in a
                # bare KeyError with no hint of which combo is malformed
                if k in ("lr", "l2") and any(k not in c for c in combos):
                    raise ValueError(
                        f"stackable combo key {k!r} is missing from "
                        f"{sum(k not in c for c in combos)} of "
                        f"{len(combos)} combos; every combo needs it")
                continue
            if any(v != vals[0] for v in vals):
                raise ValueError(
                    f"combo key {k!r} varies across the group but only "
                    f"{STACKABLE} can be stacked; run it as a separate "
                    "group (run_grouped_sweep splits on static_keys)")
            static[k] = vals[0]
        self.combos = list(combos)
        self.real_K = len(combos)
        self.mesh = mesh
        combos = list(combos)
        if mesh is not None:
            # pad the config axis to a multiple of the mesh data axis with
            # copies of the last combo: padding trains frozen (no updates)
            # and its results are dropped, so sharding never constrains what
            # grid slices the user may run
            from mmdfn_tpu.runtime.mesh import DATA_AXIS
            n = mesh.shape[DATA_AXIS]
            pad = (-len(combos)) % n
            combos = combos + [dict(combos[-1])] * pad
        self.K = len(combos)
        self._pad_mask = np.zeros(self.K, bool)
        self._pad_mask[self.real_K:] = True
        # the fused Pallas kernels ride jax.vmap's added config grid axis
        # bit-identically (validated on hardware, round 4; the one Mosaic
        # blocker — a rank-1 seed operand whose vmapped (K, 1) SMEM block
        # violated the block-shape rule — is fixed in the GCNII kernel), so
        # the stacked-config trainer keeps whatever backends the config asks
        self.cfg = dataclasses.replace(base_cfg, **static)
        self.trainer = Trainer(self.cfg)    # provides model + input prep
        self.lr = self._shard_k(jnp.asarray([c["lr"] for c in combos],
                                            jnp.float32))
        self.l2 = self._shard_k(jnp.asarray([c["l2"] for c in combos],
                                            jnp.float32))
        self.gamma = self._shard_k(jnp.asarray(
            [c.get("gamma", base_cfg.gamma) for c in combos], jnp.float32))
        if ("dropout" in STACKABLE
                and any("dropout" in c for c in self.combos)):
            # per-config traced dropout rate: thresholds precomputed
            # host-side in exact integer math so the fused kernel's draws
            # are bit-identical with a static-rate run (nn/drop_override.py)
            from mmdfn_tpu.nn.drop_override import make_drop_rate
            self.droprate = self._shard_k(make_drop_rate(
                [float(c.get("dropout", self.cfg.dropout))
                 for c in combos]))
        else:
            self.droprate = None
        alpha = self.cfg.class_weights_or_none()
        self.alpha = None if alpha is None else jnp.asarray(alpha)
        self._train_step, self._eval_step = self._build()

    # ------------------------------------------------------------------
    def _shard_k(self, tree):
        """Shard leading (config) axis over the mesh data axis; no-op without
        a mesh.  Works on single arrays and pytrees."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        from mmdfn_tpu.runtime.mesh import DATA_AXIS
        s = NamedSharding(self.mesh, P(DATA_AXIS))
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)

    def _replicate(self, tree):
        if self.mesh is None:
            return tree
        from mmdfn_tpu.runtime.mesh import replicate
        return replicate(self.mesh, tree)

    # ------------------------------------------------------------------
    def init_states(self):
        """Same seed for every config (reference seeds all runs with 2021)."""
        base = self.trainer.init_state()
        stack = lambda p: jnp.broadcast_to(p[None], (self.K,) + p.shape)
        params = self._shard_k(jax.tree_util.tree_map(stack, base.params))
        m, v, t = _adam_init(params)
        t = jnp.zeros((self.K,), jnp.float32)
        return params, self._shard_k((m, v, t))

    def _build(self):
        from mmdfn_tpu.nn import drop_override

        model = self.trainer.model
        cfg = self.cfg

        def forward(params, batch, rng, droprate=None):
            rngs = None if rng is None else {"dropout": rng}
            if droprate is not None:
                # trace-time context: every cfg.dropout-derived site reads
                # this config's traced rate instead of the static attr
                with drop_override.override({"dropout": droprate}):
                    return model.apply(
                        {"params": params}, batch["text"], batch["qmask"],
                        batch["umask"], batch["audio"], batch["visual"],
                        deterministic=rng is None, rngs=rngs)
            return model.apply(
                {"params": params}, batch["text"], batch["qmask"],
                batch["umask"], batch["audio"], batch["visual"],
                deterministic=rng is None, rngs=rngs)

        def loss_fn(params, batch, rng, gamma, droprate):
            logp = forward(params, batch, rng, droprate)
            return focal_loss(logp, batch["label"], batch["umask"],
                              gamma=gamma, alpha=self.alpha), logp

        def one_train(params, opt, batch, rng, lr, l2, gamma, droprate,
                      freeze):
            (loss, logp), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, rng, gamma, droprate)
            params, opt = _adam_update(grads, opt, params, lr, l2, freeze)
            return params, opt, loss, jnp.argmax(logp, -1)

        dr_axis = None if self.droprate is None else 0

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params_k, opt_k, batch, rng, freeze_k):
            rngs = jax.random.split(rng, self.K)
            return jax.vmap(one_train,
                            in_axes=(0, 0, None, 0, 0, 0, 0, dr_axis, 0))(
                params_k, opt_k, batch, rngs, self.lr, self.l2, self.gamma,
                self.droprate, freeze_k)

        def one_eval(params, batch, gamma):
            logp = forward(params, batch, None)
            loss = focal_loss(logp, batch["label"], batch["umask"],
                              gamma=gamma, alpha=self.alpha)
            return loss, jnp.argmax(logp, -1)

        @jax.jit
        def eval_step(params_k, batch):
            return jax.vmap(one_eval, in_axes=(0, None, 0))(
                params_k, batch, self.gamma)

        return train_step, eval_step

    # ------------------------------------------------------------------
    def _result(self, best_epoch, all_f, all_a, history) -> GroupResult:
        R = self.real_K                      # drop sharding-padding entries
        return GroupResult(
            combos=self.combos,
            best_epoch=[int(b) for b in best_epoch[:R]],
            best_test_fscore=[all_f[k][best_epoch[k]] for k in range(R)],
            best_test_acc=[all_a[k][best_epoch[k]] for k in range(R)],
            history=history[:R])

    def run(self, train_dialogues, test_dialogues, verbose: bool = True,
            save_dir: Optional[str] = None,
            resume: bool = False) -> GroupResult:
        """Train the group; with ``save_dir``, preemption-safe.

        Every epoch writes a ``last`` checkpoint (stacked params + Adam
        state + the per-config selection counters) and completion writes a
        ``final`` marker carrying the :class:`GroupResult`, mirroring the
        sequential sweep's skip-complete/resume contract
        (``cli/sweep.py``; SURVEY §5.3 — the reference's bash grid,
        ``script/run_train_ie.sh:26-60``, restarts a killed combo from
        scratch).  ``resume=True`` restores and continues from the next
        epoch; the resumed run is step-identical to an uninterrupted one
        (per-epoch RNG is derived from the epoch-independent seed and the
        batcher reshuffle is a pure function of the epoch index).
        """
        from mmdfn_tpu.runtime import checkpoint as ckpt_lib

        cfg = self.cfg
        info = cfg.info
        K = self.K
        n_classes = info["n_classes"]
        batcher = BucketBatcher(train_dialogues, cfg.batch_size,
                                info["n_speakers"], cfg.buckets,
                                shuffle=True, seed=cfg.seed)
        test_batches = list(BucketBatcher(test_dialogues, cfg.batch_size,
                                          info["n_speakers"], cfg.buckets))
        if resume and save_dir and ckpt_lib.has_checkpoint(save_dir, "final"):
            meta = ckpt_lib.read_meta(save_dir, "final")
            if meta.get("combos") != _canon_combos(self.combos):
                raise ValueError(
                    f"final checkpoint under {save_dir!r} was written for a "
                    "different combo group; point each group at its own "
                    "save_dir")
            if verbose:
                print(f"group already complete under {save_dir!r} — skipping")
            return GroupResult(combos=self.combos,
                               best_epoch=meta["best_epoch"],
                               best_test_fscore=meta["best_test_fscore"],
                               best_test_acc=meta["best_test_acc"],
                               history=meta["history"])
        params, opt = self.init_states()
        freeze = self._shard_k(jnp.asarray(self._pad_mask, jnp.float32))

        best_f = np.full(K, -1.0)
        best_epoch = np.full(K, -1, dtype=int)
        best_loss = np.full(K, np.inf)
        patience = np.zeros(K, dtype=int)
        patience2 = np.zeros(K, dtype=int)
        all_f: List[List[float]] = [[] for _ in range(K)]
        all_a: List[List[float]] = [[] for _ in range(K)]
        history: List[List[dict]] = [[] for _ in range(K)]
        start_epoch = 0

        if resume and save_dir and ckpt_lib.has_checkpoint(save_dir, "last"):
            (params, opt), meta = ckpt_lib.restore_checkpoint(
                save_dir, (params, opt), name="last")
            if meta.get("combos") != _canon_combos(self.combos):
                raise ValueError(
                    f"'last' checkpoint under {save_dir!r} was written for a "
                    "different combo group")
            # restore yields host numpy leaves; re-place with the config-axis
            # sharding (donation assumes committed placement)
            params, opt = self._shard_k(params), self._shard_k(opt)
            r = meta["counters"]
            start_epoch = int(meta["epoch"]) + 1
            best_f = np.asarray(r["best_f"])
            best_epoch = np.asarray(r["best_epoch"], dtype=int)
            best_loss = np.asarray(r["best_loss"], dtype=np.float64)
            patience = np.asarray(r["patience"], dtype=int)
            patience2 = np.asarray(r["patience2"], dtype=int)
            all_f = [list(x) for x in r["all_f"]]
            all_a = [list(x) for x in r["all_a"]]
            history = [list(x) for x in r["history"]]
            stop = np.asarray(r["stop"], dtype=bool)
            freeze = self._shard_k(jnp.asarray(stop.astype(np.float32)))
            if verbose:
                print(f"resumed group from epoch {start_epoch - 1} "
                      f"({int(K - stop.sum())}/{K} configs active)")
            if stop.all():
                start_epoch = cfg.epochs    # had fully early-stopped already

        for e in range(start_epoch, cfg.epochs):
            key = jax.random.PRNGKey(cfg.seed)  # faithful per-epoch reseed
            tr_losses = []                      # device arrays; sync once/epoch
            for i, batch in enumerate(batcher.epoch(e)):
                inputs = self._replicate(prepare_inputs(cfg, batch))
                params, opt, loss_tr, _ = self._train_step(
                    params, opt, inputs, jax.random.fold_in(key, i), freeze)
                tr_losses.append(loss_tr)
            # an epoch with zero train batches (empty split / all dialogues
            # outside the buckets) trains nothing but must still eval
            for l in tr_losses:
                if hasattr(l, "copy_to_host_async"):
                    l.copy_to_host_async()   # pipeline the D2H transfers
            train_loss_k = (np.mean(np.stack([np.asarray(l)
                                              for l in tr_losses]), axis=0)
                            if tr_losses else np.full(K, np.nan))

            # stacked eval over the test split: dispatch every batch async,
            # sync once after the loop (a per-batch np.asarray would pay two
            # blocking D2H round-trips per batch over the tunnel)
            losses, preds_all, masks, labels = [], [], [], []
            for batch in test_batches:
                inputs = self._replicate(prepare_inputs(cfg, batch))
                loss_k, preds_k = self._eval_step(params, inputs)
                losses.append(loss_k)
                preds_all.append(preds_k)
                masks.append(batch.umask.reshape(-1) > 0)
                labels.append(batch.label.reshape(-1))
            for a in (*losses, *preds_all):
                if hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()   # pipeline the D2H transfers
            labels = np.concatenate(
                [l[m] for l, m in zip(labels, masks)])
            preds = np.concatenate(
                [np.asarray(p).reshape(K, -1)[:, m]
                 for p, m in zip(preds_all, masks)], axis=1)
            loss_k = np.mean(np.stack([np.asarray(l) for l in losses]),
                             axis=0)
            freeze_host = np.asarray(freeze)    # one read, not K per epoch

            for k in range(K):
                f = round(M.f1_score(labels, preds[k], n_classes) * 100, 2)
                a = round(M.accuracy(labels, preds[k]) * 100, 2)
                all_f[k].append(f)
                all_a[k].append(a)
                history[k].append(dict(
                    epoch=e, train_loss=round(float(train_loss_k[k]), 4),
                    test_fscore=f, test_acc=a,
                    test_loss=round(float(loss_k[k]), 4)))
                if freeze_host[k] > 0:
                    continue
                if e == 0 or f > best_f[k]:
                    best_f[k], best_epoch[k], patience[k] = f, e, 0
                else:
                    patience[k] += 1
                if e == 0 or loss_k[k] < best_loss[k]:
                    best_loss[k], patience2[k] = loss_k[k], 0
                else:
                    patience2[k] += 1
            stop = ((patience >= cfg.patience) & (patience2 >= cfg.patience)
                    ) | self._pad_mask
            freeze = self._shard_k(jnp.asarray(stop.astype(np.float32)))
            if save_dir:
                ckpt_lib.save_checkpoint(
                    save_dir, (params, opt), name="last",
                    meta=dict(epoch=e, combos=self.combos, counters=dict(
                        best_f=best_f.tolist(),
                        best_epoch=best_epoch.tolist(),
                        best_loss=best_loss.tolist(),
                        patience=patience.tolist(),
                        patience2=patience2.tolist(),
                        all_f=all_f, all_a=all_a, history=history,
                        stop=stop.tolist())))
            if verbose:
                print(f"epoch {e}: fscores "
                      f"{[all_f[k][-1] for k in range(K)]} "
                      f"active {int(K - stop.sum())}/{K}")
            if stop.all():
                break

        result = self._result(best_epoch, all_f, all_a, history)
        if save_dir:
            # the 'final' marker makes a finished group skip-complete on the
            # next sweep invocation (sequential-path parity: cli/sweep.py)
            ckpt_lib.save_checkpoint(
                save_dir, (params, opt), name="final",
                meta=dict(combos=result.combos, best_epoch=result.best_epoch,
                          best_test_fscore=result.best_test_fscore,
                          best_test_acc=result.best_test_acc,
                          history=result.history))
        return result


def run_grouped_sweep(base_cfg: ExperimentConfig, combos: Sequence[dict],
                      train_dialogues, test_dialogues,
                      verbose: bool = True, mesh=None,
                      save_dir: Optional[str] = None,
                      resume: bool = False) -> List[GroupResult]:
    """Partition a sweep grid into static groups and vmap-train each.

    With ``save_dir``, each group checkpoints under a deterministic
    subdirectory (named by its static keys) so a preempted sweep resumes
    mid-group and skips finished groups entirely — parity with the
    sequential path's per-combo skip/resume (``cli/sweep.py:131-141``).
    """
    import os

    results = []
    for static, group in group_combos(combos):
        if verbose:
            where = (f" sharded over {mesh.devices.size} devices"
                     if mesh is not None else "")
            print(f"group {static}: {len(group)} configs vmapped{where}")
        group_dir = None
        if save_dir:
            slug = "_".join(f"{k}{v}" for k, v in sorted(static.items())) \
                or "base"
            group_dir = os.path.join(save_dir, f"group_{slug}")
        cfg = dataclasses.replace(base_cfg, **static)
        sweep = VmapSweep(cfg, group, mesh=mesh)
        results.append(sweep.run(train_dialogues, test_dialogues, verbose,
                                 save_dir=group_dir, resume=resume))
    return results
