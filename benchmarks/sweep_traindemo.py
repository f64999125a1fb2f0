"""Hardware soak of the vmapped multi-config sweep: K configs TRAIN at once.

`SWEEP_BENCH_r05.json` measures the steady-state step throughput of config
stacking; this demo is the end-to-end evidence that the config-parallel
trainer (train/vmap_sweep.py) actually *trains* on the real chip — a
K=8 lr x DROPOUT x gamma sub-grid of the reference IEMOCAP sweep
(`script/run_train_ie.sh:19-52`; dropout rides the config axis as a traced
rate, nn/drop_override.py) over the flagship config (IEMOCAP GDF, 16 GCNII
layers, fused Pallas kernels riding `jax.vmap`, in-kernel PRNG dropout with
per-config SMEM thresholds) runs `VmapSweep.run`'s full epoch loop on the
SEPARABLE synthetic task (labels a deterministic function of the features,
data/synthetic.py): per-config histories diverge by combo, the per-config
freeze-mask early stopping runs live, held-out F1 goes far above chance,
and the whole group shares ONE compiled executable.

The reference's counterpart is the sequential bash grid
(`script/run_train_ie.sh:26-60`) — one process per combo, one at a time.

Writes SWEEPDEMO_r{N}.json.  Run on TPU:
    PYTHONPATH=. python benchmarks/sweep_traindemo.py SWEEPDEMO_r04.json
"""

import json
import sys
import time


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SWEEPDEMO_r05.json"

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.data.datasets import IEMOCAPDataset
    from mmdfn_tpu.data.synthetic import make_separable_iemocap_pickle
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache
    from mmdfn_tpu.train.vmap_sweep import VmapSweep

    enable_compilation_cache()

    import tempfile
    pkl = tempfile.mktemp(suffix=".pkl")
    make_separable_iemocap_pickle(pkl, n_train=192, n_test=64,
                                  min_len=8, max_len=60, seed=7)
    train = IEMOCAPDataset(pkl, True).dialogues()
    test = IEMOCAPDataset(pkl, False).dialogues()

    cfg = ExperimentConfig(
        dataset="IEMOCAP", graph_type="GDF", reason_flag=True,
        class_weight=True, Deep_GCN_nlayers=16, batch_size=32,
        speaker_weights="3-0-1", epochs=8, patience=3,
        buckets=(16, 32, 64)).with_tpu_fast()
    # a K=8 sub-grid of the reference IEMOCAP sweep: lr x dropout x gamma
    # (run_train_ie.sh:19-52) — dropout varies INSIDE the group
    combos = [dict(lr=lr, l2=1e-4, dropout=dp, gamma=g)
              for lr in (3e-4, 1e-3) for dp in (0.2, 0.4)
              for g in (0.5, 1.0)]

    sweep = VmapSweep(cfg, combos)
    t0 = time.perf_counter()
    res = sweep.run(train, test, verbose=True)
    wall = time.perf_counter() - t0

    import jax
    payload = dict(
        note=("K=8 lr x dropout x gamma flagship configs (a sub-grid of "
              "the reference IEMOCAP sweep) trained SIMULTANEOUSLY via the "
              "vmapped sweep on one chip — dropout rides the config axis "
              "as a traced rate down to the fused kernel's in-kernel PRNG "
              "threshold; per-config histories diverge by combo, the "
              "freeze-mask early stopping runs per config, and the task "
              "is the SEPARABLE one so held-out F1 must be far above "
              "chance (learning, not memorization)."),
        platform=jax.devices()[0].platform,
        config=dict(graph_type=cfg.graph_type, nlayers=cfg.Deep_GCN_nlayers,
                    batch_size=cfg.batch_size, epochs=cfg.epochs,
                    patience=cfg.patience, n_train=192, n_test=64,
                    rnn_backend=cfg.rnn_backend, gcn_backend=cfg.gcn_backend),
        combos=res.combos,
        best_epoch=res.best_epoch,
        best_test_fscore=res.best_test_fscore,
        wall_s=round(wall, 1),
        history=res.history)
    with open(out_path, "w") as f:
        json.dump(payload, f)
    print(json.dumps(dict(wall_s=payload["wall_s"],
                          best_epoch=res.best_epoch,
                          best_test_fscore=res.best_test_fscore)))


if __name__ == "__main__":
    main()
