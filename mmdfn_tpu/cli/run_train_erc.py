"""CLI entry point with the reference's exact flag surface.

Every flag from the reference argparse (``code/run_train_erc.py:243-336``) is
accepted with the same name, type, and default, so the sweep-script
invocations (``script/run_train_ie.sh:39-53`` / ``run_train_me.sh:40-52``)
port verbatim:

    python -m mmdfn_tpu.cli.run_train_erc --dataset IEMOCAP --data_dir ... \
        --Deep_GCN_nlayers 16 --lr 0.0003 --l2 0.0001 --dropout 0.2 \
        --gamma 0.5 --speaker_weights 3-0-1 --class_weight --reason_flag

Reference quirks handled deliberately:
  * flags declared ``store_true`` with ``default=True`` (``--multi_modal``,
    ``--graph_model``, ``--nodal_attention``, ``--use_residue``,
    ``--use_crn_speaker``) are un-disableable in the reference; we keep them
    AND add ``--no_<flag>`` negations as a build-side extension;
  * ``--test_label`` restores a checkpoint and evaluates only, saving
    ``test_label.npy``/``test_pred.npy`` like ``run_train_erc.py:544-545``;
  * checkpoints are really written (the reference never writes any, §5.4 of
    SURVEY.md) under ``--save_model_dir``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native MM-DFN trainer (reference-compatible flags)")
    add = p.add_argument
    add("--no_cuda", action="store_true", default=False,
        help="kept for flag parity; device selection is JAX's")
    add("--dataset", default="IEMOCAP")
    add("--data_dir", type=str,
        default="../data/iemocap/IEMOCAP_features.pkl")
    add("--multi_modal", action="store_true", default=True)
    add("--no_multi_modal", dest="multi_modal", action="store_false")
    add("--modals", default="avl")
    add("--mm_fusion_mthd", default="concat_subsequently")
    add("--use_modal", action="store_true", default=False)
    add("--base_model", default="LSTM")
    add("--graph_model", action="store_true", default=True)
    add("--no_graph_model", dest="graph_model", action="store_false")
    add("--graph_type", default="GDF")
    add("--graph_construct", default="direct")
    add("--use_gcn", action="store_true", default=False)
    add("--nodal_attention", action="store_true", default=True)
    add("--no_nodal_attention", dest="nodal_attention", action="store_false")
    add("--use_topic", action="store_true", default=False)
    add("--use_residue", action="store_true", default=True)
    add("--no_use_residue", dest="use_residue", action="store_false")
    add("--av_using_lstm", action="store_true", default=False)
    add("--active_listener", action="store_true", default=False)
    add("--attention", default="general")
    add("--use_crn_speaker", action="store_true", default=True)
    add("--no_use_crn_speaker", dest="use_crn_speaker", action="store_false")
    add("--speaker_weights", type=str, default="3-0-1")
    add("--use_speaker", action="store_true", default=False)
    add("--reason_flag", action="store_true", default=False)
    add("--epochs", type=int, default=30, metavar="E")
    add("--batch-size", type=int, default=32, metavar="BS", dest="batch_size")
    add("--valid_rate", type=float, default=0.0, metavar="valid_rate")
    add("--modal_weight", type=float, default=1.0)
    add("--Deep_GCN_nlayers", type=int, default=16)
    add("--lr", type=float, default=0.0003, metavar="LR")
    add("--l2", type=float, default=0.0001, metavar="L2")
    add("--rec_dropout", type=float, default=0.1, metavar="rec_dropout")
    add("--dropout", type=float, default=0.4, metavar="dropout")
    add("--alpha", type=float, default=0.2)
    add("--lamda", type=float, default=0.5)
    add("--gamma", type=float, default=0.5)
    add("--windowp", type=int, default=10)
    add("--windowf", type=int, default=10)
    add("--multiheads", type=int, default=6)
    add("--loss", default="FocalLoss")
    add("--class_weight", action="store_true", default=False)
    add("--save_model_dir", type=str, default="outputs/iemocap_demo/")
    add("--tensorboard", action="store_true", default=False)
    add("--test_label", action="store_true", default=False)
    add("--load_model", type=str, default="")
    add("--seed", type=int, default=2021)
    add("--patience", type=int, default=5)
    # --- build-side extensions ---
    add("--log_jsonl", type=str, default=None,
        help="append per-epoch metric rows to this JSONL file")
    add("--sort_batches_by_length", action="store_true", default=False,
        help="minimize padding waste (build-side optimization)")
    add("--n_data_devices", type=int, default=0,
        help="data-parallel over this many devices (0 = single device)")
    add("--n_model_devices", type=int, default=1,
        help="node-shard the GCNII stack's graph over this many devices "
             "(tensor parallelism for the single-huge-graph regime; "
             "composes with --n_data_devices on a 2-D mesh)")
    add("--profile_dir", type=str, default=None,
        help="write a jax.profiler trace of training to this dir")
    add("--debug_nans", action="store_true", default=False,
        help="fail fast on nan/inf inside jitted steps")
    add("--resume", action="store_true", default=False,
        help="continue an interrupted run from save_model_dir's 'last' "
             "checkpoint (params + optimizer + selection counters)")
    add("--faithful_epoch_reseed", action="store_true", default=True,
        help="reference parity: re-derive the same dropout key stream every "
             "epoch (run_train_erc.py:164)")
    add("--no_faithful_epoch_reseed", dest="faithful_epoch_reseed",
        action="store_false",
        help="fold the epoch into the dropout key instead (fresh draws)")
    add("--matmul_precision", type=str, default=None,
        choices=["default", "float32", "highest"],
        help="matmul precision for this trainer's steps; 'highest'/'float32' "
             "for strict reference parity (TPU default is bf16 inputs)")
    add("--transfer_dtype", type=str, default="float32",
        choices=["float32", "bfloat16"],
        help="H2D feature transfer dtype; bfloat16 halves transfer bytes")
    add("--gcn_compute_dtype", type=str, default=None,
        choices=["float32", "bfloat16"],
        help="run the GCNII layer scan in bfloat16 (params/adjacency stay "
             "f32) — ~1.4x faster stack; default f32 for strict parity")
    add("--rnn_compute_dtype", type=str, default=None,
        choices=["float32", "bfloat16"],
        help="run the encoder GRU/LSTM scans in bfloat16 (f32 masters)")
    add("--gcn_scan_unroll", type=int, default=None,
        help="unroll factor for the GCNII layer scan; default full unroll "
             "(fastest on TPU), set e.g. 2 to cap program size/compile time")
    add("--rnn_fuse_directions", action="store_true", default=False,
        help="run each BiRNN layer's fwd+bwd directions in one scan "
             "(identical math, fewer sequential scans)")
    add("--rnn_scan_remat", action="store_true", default=False,
        help="checkpoint the RNN scan step (backward recomputes gates "
             "instead of reading per-step residuals from HBM)")
    add("--edge_attn_type", type=str, default="attn1",
        choices=["attn1", "attn2", "attn3"],
        help="relation-path edge-weight branch (the reference hard-codes "
             "attn1; attn2/attn3 are its dead variants)")
    add("--rnn_backend", type=str, default=None, choices=["xla", "pallas"],
        help="'pallas': fused bi-GRU recurrence kernel (fwd + custom bwd) "
             "replacing the per-direction lax.scan chains")
    add("--gcn_backend", type=str, default=None,
        choices=["xla", "pallas", "pallas_fused"],
        help="'pallas': fully fused GCNII train stack (fwd + custom bwd + "
             "in-kernel hardware-PRNG dropout)")
    add("--gcn_bwd_block", type=int, default=None,
        help="batch elements per backward grid step of the fused GCNII "
             "kernel (must divide batch_size; non-divisors fall back to 1)")
    add("--tpu_fast", action="store_true",
        help="enable every measured-win TPU perf knob in one flag (the "
             "production bench config: fused pallas GCNII+RNN kernels, "
             "bf16 GCNII scan fallback, RNN-scan remat, batch-blocked "
             "backward, hardware-RNG dropout; math equivalent up to bf16 "
             "rounding and different-but-deterministic dropout draws)")
    add("--rng_impl", type=str, default=None,
        choices=["threefry", "rbg", "unsafe_rbg"],
        help="'rbg': dropout bits from the TPU hardware RNG instead of "
             "threefry (faster; different-but-deterministic draws)")
    add("--gcn_scan_remat", action="store_true", default=False,
        help="checkpoint each GCNII layer (backward recomputes adj@h + "
             "gates instead of reading per-layer residuals from HBM)")
    add("--param_dtype", type=str, default="float32",
        choices=["float32", "bfloat16"])
    add("--buckets", type=str, default=None,
        help="comma-separated static padding lengths, e.g. 16,32,64,128,200 "
             "(one XLA executable per bucket)")
    # DailyDialogue token frontend (--dataset DailyDialogue trains
    # DialogueGCNDailyModel end-to-end; the reference ships the loader and
    # model but never wires them, dataloader.py:71-101)
    add("--vocab_size", type=int, default=5000)
    add("--max_words", type=int, default=20,
        help="static token-axis width per utterance (DailyDialogue)")
    add("--embedding_dim", type=int, default=300)
    add("--cnn_filters", type=int, default=50)
    add("--cnn_output_size", type=int, default=100)
    return p


def config_from_args(args) -> "ExperimentConfig":
    from mmdfn_tpu.config import ExperimentConfig
    fields = {f.name for f in dataclasses.fields(ExperimentConfig)}
    kw = {k: v for k, v in vars(args).items() if k in fields}
    # snapshot the preset knobs BEFORE the off-sentinel normalization below
    # ('xla'/'threefry'/'float32' -> None): an explicitly-passed opt-out
    # must beat --tpu_fast, and post-normalization it is indistinguishable
    # from "not given"
    raw_knobs = {k: kw.get(k) for k in ExperimentConfig.TPU_FAST_KNOBS}
    if getattr(args, "buckets", None):
        kw["buckets"] = tuple(int(b) for b in args.buckets.split(","))
    elif "buckets" in kw:
        del kw["buckets"]                     # keep the dataclass default
    if kw.get("matmul_precision") == "default":
        kw["matmul_precision"] = None
    if kw.get("gcn_compute_dtype") == "float32":
        kw["gcn_compute_dtype"] = None
    if kw.get("rnn_compute_dtype") == "float32":
        kw["rnn_compute_dtype"] = None
    if kw.get("rnn_backend") == "xla":
        kw["rnn_backend"] = None
    if kw.get("gcn_backend") == "xla":
        kw["gcn_backend"] = None
    if kw.get("rng_impl") == "threefry":
        kw["rng_impl"] = None
    tpu_fast = getattr(args, "tpu_fast", False)  # not a config field
    cfg = ExperimentConfig(**kw)
    if tpu_fast:
        # explicit flags win over the preset for any knob the user also
        # set — judged on the PRE-normalization values, so explicit
        # opt-outs (--gcn_backend xla, --rng_impl threefry,
        # --gcn_compute_dtype float32, ...) also beat the preset
        preset = {k: v for k, v in ExperimentConfig.TPU_FAST_KNOBS.items()
                  if raw_knobs.get(k) in (None, False)}
        cfg = dataclasses.replace(cfg, **preset)
    return cfg


def load_dialogues(cfg):
    """Dataset + split assembly (reference ``run_train_erc.py:29-89``)."""
    from mmdfn_tpu.data.datasets import (DailyDialogueDataset, IEMOCAPDataset,
                                         MELDDataset, train_valid_split)
    if cfg.dataset == "DailyDialogue":
        # the DailyDialogue pickle carries its own train/test/valid id lists
        # (dataloader.py:82-89) — valid_rate does not apply
        return (DailyDialogueDataset("train", cfg.data_dir).dialogues(),
                DailyDialogueDataset("valid", cfg.data_dir).dialogues(),
                DailyDialogueDataset("test", cfg.data_dir).dialogues())
    ds_cls = {"IEMOCAP": IEMOCAPDataset, "MELD": MELDDataset}[cfg.dataset]
    train_all = ds_cls(cfg.data_dir, train=True).dialogues()
    test = ds_cls(cfg.data_dir, train=False).dialogues()
    tr_idx, va_idx = train_valid_split(len(train_all), cfg.valid_rate)
    train = [train_all[i] for i in tr_idx]
    valid = [train_all[i] for i in va_idx]
    return train, valid, test


def count_params(params) -> int:
    import jax
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    print(args)

    cfg = config_from_args(args)
    cfg = dataclasses.replace(cfg, log_jsonl=args.log_jsonl,
                              sort_batches_by_length=args.sort_batches_by_length)

    from mmdfn_tpu.runtime import checkpoint as ckpt_lib
    from mmdfn_tpu.train import Trainer

    mesh = None
    if args.n_data_devices or args.n_model_devices > 1:
        from mmdfn_tpu.runtime.mesh import make_mesh
        mesh = make_mesh(n_data=args.n_data_devices or 1,
                         n_model=args.n_model_devices)

    if cfg.dataset == "DailyDialogue":
        from mmdfn_tpu.train.daily_trainer import DailyTrainer
        trainer = DailyTrainer(cfg, mesh=mesh)
    else:
        trainer = Trainer(cfg, mesh=mesh)
    train, valid, test = load_dialogues(cfg)

    if args.test_label:
        # restore-and-evaluate (reference run_train_erc.py:531-549)
        load_dir = args.load_model or args.save_model_dir
        if not ckpt_lib.has_checkpoint(load_dir):
            print(f"no checkpoint found under {load_dir!r}", file=sys.stderr)
            return 1
        state, meta = ckpt_lib.restore_checkpoint(load_dir,
                                                  trainer.init_state())
        m = trainer.evaluate(state, test)
        os.makedirs(args.save_model_dir, exist_ok=True)
        np.save(os.path.join(args.save_model_dir, "test_label.npy"), m.labels)
        np.save(os.path.join(args.save_model_dir, "test_pred.npy"), m.preds)
        # per-layer activation dump (reference model_GCN.py:474-480 behavior)
        trainer.dump_activations(
            state, test, os.path.join(args.save_model_dir,
                                      "test_activations.npz"))
        print(m.report)
        print("test_acc:", m.acc, "test_fscore:", m.fscore)
        return 0

    from mmdfn_tpu.runtime.profiling import (debug_numerics,
                                             enable_compilation_cache, trace)

    enable_compilation_cache()
    if args.debug_nans:
        debug_numerics(True)

    state = trainer.init_state()
    print("The model have {} parameters in total".format(
        count_params(state.params)))

    writer = None
    if args.tensorboard:
        writer = _make_tensorboard_writer(args.save_model_dir)
        if writer is not None:
            trainer.grad_hist_sink = _grad_hist_sink(writer)

    with trace(args.profile_dir):
        result = trainer.fit(train, test, valid_dialogues=valid, state=state,
                             verbose=True, log_path=cfg.log_jsonl,
                             save_dir=args.save_model_dir,
                             resume=args.resume)

    if writer is not None:
        for row in result.history:
            for k, v in row.items():
                if isinstance(v, (int, float)) and v == v:
                    writer.add_scalar(k, v, row["epoch"])
        writer.close()
    return 0


def _make_tensorboard_writer(save_dir: str):
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        print("tensorboardX not installed; epoch metrics go to stdout/JSONL, "
              "gradient histograms are skipped")
        return None
    return SummaryWriter(logdir=os.path.join(save_dir, "tensorboard"))


def _grad_hist_sink(writer):
    """Per-batch per-parameter gradient histograms, reference
    ``run_train_erc.py:120-122,209-211`` — fed from the on-device reductions
    (counts/edges/moments), so no full gradient tensor crosses to the host."""
    def sink(step: int, hists: dict):
        for name, h in hists.items():
            tag = "grad/" + name.strip("[]'\"").replace("']['", "/")
            writer.add_histogram_raw(
                tag, min=float(h["min"]), max=float(h["max"]),
                num=int(h["num"]), sum=float(h["sum"]),
                sum_squares=float(h["sum_sq"]),
                bucket_limits=np.asarray(h["edges"])[1:].tolist(),
                bucket_counts=np.asarray(h["counts"]).tolist(),
                global_step=step)
    return sink


if __name__ == "__main__":
    sys.exit(main())
