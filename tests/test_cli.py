"""CLI flag-surface and end-to-end invocation tests (in-process, CPU)."""

import os

import numpy as np
import pytest

from mmdfn_tpu.cli.run_train_erc import build_parser, config_from_args, main
from mmdfn_tpu.cli.sweep import GRIDS, combo_tag, combos


def test_reference_flag_surface_defaults():
    """Every reference flag parses with the reference default."""
    args = build_parser().parse_args([])
    expect = dict(
        no_cuda=False, dataset="IEMOCAP", multi_modal=True, modals="avl",
        mm_fusion_mthd="concat_subsequently", use_modal=False,
        base_model="LSTM", graph_model=True, graph_type="GDF",
        graph_construct="direct", use_gcn=False, nodal_attention=True,
        use_topic=False, use_residue=True, av_using_lstm=False,
        active_listener=False, attention="general", use_crn_speaker=True,
        speaker_weights="3-0-1", use_speaker=False, reason_flag=False,
        epochs=30, batch_size=32, valid_rate=0.0, modal_weight=1.0,
        Deep_GCN_nlayers=16, lr=0.0003, l2=0.0001, rec_dropout=0.1,
        dropout=0.4, alpha=0.2, lamda=0.5, gamma=0.5, windowp=10,
        windowf=10, multiheads=6, loss="FocalLoss", class_weight=False,
        tensorboard=False, test_label=False, seed=2021, patience=5)
    for k, v in expect.items():
        assert getattr(args, k) == v, k


def test_sweep_script_invocation_parses():
    """The run_train_ie.sh command line ports verbatim."""
    argv = ("--dataset IEMOCAP --data_dir d.pkl --mm_fusion_mthd "
            "concat_subsequently --modals avl --graph_type GDF "
            "--Deep_GCN_nlayers 32 --lr 0.0001 --l2 0.0002 --dropout 0.2 "
            "--gamma 1 --speaker_weights 3-0-1 --class_weight "
            "--reason_flag --batch-size 32").split()
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    assert cfg.Deep_GCN_nlayers == 32 and cfg.gamma == 1.0
    assert cfg.class_weight and cfg.reason_flag
    assert cfg.batch_size == 32 and cfg.l2 == 0.0002


def test_grid_sizes():
    assert len(list(combos("IEMOCAP"))) == 32
    assert len(list(combos("MELD"))) == 48
    tags = [combo_tag(c) for c in combos("IEMOCAP")]
    assert len(set(tags)) == 32


def test_cli_end_to_end(tmp_path):
    from mmdfn_tpu.data.synthetic import make_synthetic_iemocap_pickle
    pkl = str(tmp_path / "iem.pkl")
    make_synthetic_iemocap_pickle(pkl, n_train=6, n_test=3, min_len=4,
                                  max_len=8, seed=2)
    out = str(tmp_path / "out")
    rc = main(["--dataset", "IEMOCAP", "--data_dir", pkl, "--epochs", "1",
               "--batch-size", "4", "--Deep_GCN_nlayers", "2",
               "--save_model_dir", out])
    assert rc == 0
    rc = main(["--dataset", "IEMOCAP", "--data_dir", pkl, "--batch-size",
               "4", "--Deep_GCN_nlayers", "2", "--test_label",
               "--load_model", out, "--save_model_dir", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "test_pred.npy"))
    preds = np.load(os.path.join(out, "test_pred.npy"))
    labels = np.load(os.path.join(out, "test_label.npy"))
    assert preds.shape == labels.shape and preds.ndim == 1
    acts = np.load(os.path.join(out, "test_activations.npz"))
    assert len(acts.files) > 5  # per-module intermediate dumps exist


def test_sweep_cli_vmap_end_to_end_and_summary_idempotent(tmp_path,
                                                         monkeypatch):
    """The sweep CLI's --vmap path end to end on a monkeypatched tiny grid:
    mixed-dropout combos group as ONE vmapped group per layer count, the
    group checkpoints under out_dir, and re-invoking the finished sweep
    returns the saved results WITHOUT duplicating summary.jsonl rows
    (the resume path rewrites the summary instead of appending)."""
    import json as _json

    import mmdfn_tpu.cli.sweep as sweep_cli
    from mmdfn_tpu.data.synthetic import make_synthetic_iemocap_pickle

    tiny = {"IEMOCAP": dict(
        Deep_GCN_nlayers=[2], lr=[1e-3, 3e-3], l2=[1e-4],
        dropout=[0.2, 0.4], gamma=[0.5],
        fixed=dict(speaker_weights="3-0-1", class_weight=True,
                   reason_flag=True, graph_type="GDF", valid_rate=0.0,
                   buckets=(8,)))}
    monkeypatch.setattr(sweep_cli, "GRIDS", tiny)

    pkl = str(tmp_path / "iem.pkl")
    make_synthetic_iemocap_pickle(pkl, n_train=4, n_test=2, min_len=4,
                                  max_len=8, seed=2)
    out = str(tmp_path / "sweep")
    argv = ["--dataset", "IEMOCAP", "--data_dir", pkl, "--epochs", "2",
            "--batch-size", "2", "--out_dir", out, "--vmap"]
    assert sweep_cli.main(argv) == 0

    summary = os.path.join(out, "summary.jsonl")
    rows = [_json.loads(l) for l in open(summary)]
    assert len(rows) == 4                       # 2 lr x 2 dropout, one group
    tags = {r["tag"] for r in rows}
    assert len(tags) == 4
    assert {r["dropout"] for r in rows} == {0.2, 0.4}

    # second invocation: finished group loads from its 'final' marker and
    # the summary is rewritten, not appended
    assert sweep_cli.main(argv) == 0
    rows2 = [_json.loads(l) for l in open(summary)]
    assert len(rows2) == 4
    assert [r["tag"] for r in rows2] == [r["tag"] for r in rows]
    assert [r["best_test_fscore"] for r in rows2] == \
        [r["best_test_fscore"] for r in rows]


def test_cli_test_label_missing_checkpoint(tmp_path, capsys):
    from mmdfn_tpu.data.synthetic import make_synthetic_iemocap_pickle
    pkl = str(tmp_path / "iem.pkl")
    make_synthetic_iemocap_pickle(pkl, n_train=2, n_test=2, min_len=4,
                                  max_len=6, seed=2)
    rc = main(["--dataset", "IEMOCAP", "--data_dir", pkl, "--test_label",
               "--load_model", str(tmp_path / "nope")])
    assert rc == 1


def test_parity_toggle_flags_round_trip():
    argv = ("--no_faithful_epoch_reseed --matmul_precision highest "
            "--transfer_dtype bfloat16 --param_dtype float32 "
            "--buckets 8,16,32").split()
    cfg = config_from_args(build_parser().parse_args(argv))
    assert cfg.faithful_epoch_reseed is False
    assert cfg.matmul_precision == "highest"
    assert cfg.transfer_dtype == "bfloat16"
    assert cfg.buckets == (8, 16, 32)
    # defaults preserved when the flags are absent
    cfg = config_from_args(build_parser().parse_args([]))
    assert cfg.faithful_epoch_reseed is True
    assert cfg.matmul_precision is None
    assert cfg.buckets[0] == 16 and len(cfg.buckets) == 9
    # 'default' sentinel maps to None (backend default precision)
    cfg = config_from_args(build_parser().parse_args(
        ["--matmul_precision", "default"]))
    assert cfg.matmul_precision is None


def test_tpu_fast_preset():
    """--tpu_fast enables every measured-win knob; explicit flags win."""
    from mmdfn_tpu.config import ExperimentConfig

    cfg = config_from_args(build_parser().parse_args(["--tpu_fast"]))
    for k, v in ExperimentConfig.TPU_FAST_KNOBS.items():
        assert getattr(cfg, k) == v, k
    # an explicitly-set knob overrides the preset value
    cfg = config_from_args(build_parser().parse_args(
        ["--tpu_fast", "--gcn_bwd_block", "4"]))
    assert cfg.gcn_bwd_block == 4
    assert cfg.rnn_backend == "pallas"
    # explicit OPT-OUTS beat the preset too: the off sentinels ('xla',
    # 'threefry', 'float32') are normalized to None before the config is
    # built, so precedence must be judged on the pre-normalization values
    cfg = config_from_args(build_parser().parse_args(
        ["--tpu_fast", "--gcn_backend", "xla", "--rng_impl", "threefry",
         "--gcn_compute_dtype", "float32"]))
    assert cfg.gcn_backend is None
    assert cfg.rng_impl is None
    assert cfg.gcn_compute_dtype is None
    assert cfg.rnn_backend == "pallas"      # untouched knobs still preset
    # the config-level helper applies the same set
    cfg2 = ExperimentConfig().with_tpu_fast()
    for k, v in ExperimentConfig.TPU_FAST_KNOBS.items():
        assert getattr(cfg2, k) == v, k
    # off by default: the parity defaults stay untouched without the flag
    base = config_from_args(build_parser().parse_args([]))
    assert base.gcn_backend is None and base.rng_impl is None


def test_cli_tensorboard_grad_histograms(tmp_path):
    from mmdfn_tpu.data.synthetic import make_synthetic_iemocap_pickle
    pkl = str(tmp_path / "iem.pkl")
    make_synthetic_iemocap_pickle(pkl, n_train=4, n_test=2, min_len=4,
                                  max_len=8, seed=2)
    out = str(tmp_path / "out")
    rc = main(["--dataset", "IEMOCAP", "--data_dir", pkl, "--epochs", "1",
               "--batch-size", "4", "--Deep_GCN_nlayers", "2",
               "--save_model_dir", out, "--tensorboard"])
    assert rc == 0
    tb_dir = os.path.join(out, "tensorboard")
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events, "no tensorboard event file written"
    # histogram rows (one per parameter per batch) + epoch scalars present
    from tensorboardX.proto import event_pb2
    import struct
    hist_tags, scalar_tags = set(), set()
    with open(os.path.join(tb_dir, events[0]), "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        (length,) = struct.unpack_from("<Q", data, pos)
        pos += 12                                   # len + len-crc
        ev = event_pb2.Event()
        ev.ParseFromString(data[pos:pos + length])
        pos += length + 4                           # payload + payload-crc
        for v in ev.summary.value:
            if v.HasField("histo"):
                hist_tags.add(v.tag)
            elif v.HasField("simple_value"):
                scalar_tags.add(v.tag)
    assert any(t.startswith("grad/") for t in hist_tags), hist_tags
    assert len([t for t in hist_tags if t.startswith("grad/")]) > 10
    assert "train_loss" in scalar_tags


def test_bench_production_config_is_valid():
    """bench.py's PRODUCTION_CONFIG must always construct a Trainer and run
    one tiny train step — the driver's benchmark depends on it, and a field
    rename would otherwise only fail on real TPU hardware."""
    import sys
    import numpy as np
    import jax

    sys.path.insert(0, ".")
    import bench
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.train import Trainer

    cfg = ExperimentConfig(**{**bench.PRODUCTION_CONFIG,
                              "batch_size": 2, "Deep_GCN_nlayers": 2})
    trainer = Trainer(cfg)
    state = trainer.init_state()
    batch = bench.make_batch(np.random.default_rng(0), 2, 24)
    state, loss, _ = trainer._train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
