"""Import a reference (PyTorch) MM-DFN checkpoint into this framework.

The reference's only checkpoint format is a WHOLE-MODULE pickle: training
never saves (zero ``torch.save`` calls in ``code/``), and test mode loads
``model = torch.load(args.load_model)`` (``run_train_erc.py:532``).  A user
migrating from the reference therefore arrives with either such a pickle or
a ``state_dict`` they extracted themselves.  This tool converts both into
our flax parameter tree so a trained reference model can be served/evaluated
(or fine-tuned) here without retraining.

Scope: the flagship architecture both reference sweep scripts train —
``DialogueGNNModel`` with ``base_model='LSTM'``, ``graph_type`` GDF/GF,
``modals='avl'``, ``att_type='concat_subsequently'``,
``av_using_lstm=False``, ``use_crn_speaker=True`` (``run_train_ie.sh``,
``run_train_me.sh``).  Live parameters on that path: the three modality
projections, the ``lstm_l`` text bi-GRU, the shared ``rnn_parties`` CRN GRU,
GCNII ``fcs.0`` + per-layer conv weights + the shared reason-LSTM, and the
classifier head (``model.py:853-868,949-954``, ``model_GCN.py:412-433``).
Parameters the reference allocates but never uses on this path (``a_fc``
& co, ``model_mm.py:55-75``; ``att_model``; embeddings gated off by
``use_speaker/use_modal=False``) are ignored, mirroring the forward.

The mapping is the exact inverse of the one the golden-oracle test uses to
load OUR params into the REAL reference model
(``tests/test_reference_oracle.py:load_ours_into_reference``); the
round-trip is asserted in ``tests/test_import_torch_checkpoint.py`` by
forward agreement between the real reference and our model on the imported
weights.

CLI:
    python -m mmdfn_tpu.tools.import_torch_checkpoint \
        --load_model /path/to/reference_model.pkl --out ckpts/imported \
        --Deep_GCN_nlayers 16 --dataset IEMOCAP
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

# state_dict prefixes that are dead on the flagship forward path (see
# module docstring + tests/test_reference_oracle.py:DEAD_PREFIXES)
IGNORED_PREFIXES = (
    "att_model.", "gatedatt.",
    "graph_model.a_fc.", "graph_model.v_fc.", "graph_model.l_fc.",
    "graph_model.feature_fc.", "graph_model.final_fc.",
    "graph_model.modal_embeddings.", "graph_model.speaker_embeddings.",
    "graph_model.a_spk_embs.", "graph_model.v_spk_embs.",
    "graph_model.l_spk_embs.",
    # GCNII_lyc allocates the reason-LSTM unconditionally
    # (model_GCN.py:433); with reason_flag=False it never runs
    "graph_model.graph_net.rnn.",
)


def _np(v) -> np.ndarray:
    """torch.Tensor / ndarray -> float32 ndarray (no torch import needed
    when the caller already passes ndarrays)."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _set(params: Dict, path: tuple, value: np.ndarray, used: set) -> None:
    node = params
    for k in path[:-1]:
        node = node[k]
    old = node[path[-1]]
    if np.shape(old) != value.shape:
        raise ValueError(
            f"shape mismatch importing {'/'.join(path)}: checkpoint "
            f"{value.shape} vs model {np.shape(old)} — architecture flags "
            "(Deep_GCN_nlayers / dataset dims / n_classes) must match the "
            "checkpoint's")
    node[path[-1]] = value.astype(np.asarray(old).dtype)
    used.add(path)


def _gru_from_sd(sd: Mapping, torch_name: str, params: Dict, our_name: str,
                 used: set) -> None:
    """Inverse of the oracle test's ``_gru_entries``: a torch
    ``nn.GRU(num_layers=2, bidirectional=True)`` into our BiRNN params."""
    for layer in range(2):
        for di, d in enumerate(("fwd", "bwd")):
            suf = "_reverse" if di else ""
            ours = f"l{layer}_{d}"
            _set(params, (our_name, f"w_ih_{ours}"),
                 _np(sd[f"{torch_name}.weight_ih_l{layer}{suf}"]).T, used)
            _set(params, (our_name, f"w_hh_{ours}"),
                 _np(sd[f"{torch_name}.weight_hh_l{layer}{suf}"]).T, used)
            _set(params, (our_name, f"b_ih_{ours}"),
                 _np(sd[f"{torch_name}.bias_ih_l{layer}{suf}"]), used)
            _set(params, (our_name, f"b_hh_{ours}"),
                 _np(sd[f"{torch_name}.bias_hh_l{layer}{suf}"]), used)


# per-family dead-key prefixes (see tests/test_reference_oracle.py:
# DEAD_PREFIXES / RELATION_DEAD and the GF2 mapping's assert_covered)
FAMILY_IGNORED = {
    "GDF": IGNORED_PREFIXES,
    "GF2": ("att_model.", "gatedatt."),
    # att_model.scalar IS live on the relation path (attn1 edge weights,
    # model.py:445); the other MaskedEdgeAttention branches are dead there
    "relation": ("att_model.matchatt.", "att_model.simpleatt.",
                 "att_model.att.", "gatedatt."),
}


def _detect_family(params: Mapping) -> str:
    """Infer the checkpoint family from OUR param-tree template."""
    gm = params.get("graph_model", {})
    if "graph_net" in gm:
        return "GDF"                 # GDF/GF share the MM_GCN/GCNII tree
    if "convs" in gm:
        return "GF2"                 # MM_GCN2 (model_mm.py:219-258)
    if "graph_net_a" in params:
        return "relation"            # three RGCN+GraphConv nets
    raise ValueError(
        "unrecognized param-tree template: expected the flagship GDF/GF "
        "tree, the GF2 (MM_GCN2) tree, or the multimodal relation tree "
        "(see module docstring for scope)")


def _shared_from_sd(sd: Mapping, params: Dict, used: set) -> None:
    """Encoders + head shared by every DialogueGNNModel family
    (``model.py:853-868,949-954``): modality projections, text bi-GRU,
    CRN party bi-GRU, smax head."""
    for m in ("a", "v", "l"):
        _set(params, (f"linear_{m}", "kernel"),
             _np(sd[f"linear_{m}.weight"]).T, used)
        _set(params, (f"linear_{m}", "bias"),
             _np(sd[f"linear_{m}.bias"]), used)
    _gru_from_sd(sd, "lstm_l", params, "lstm_l", used)
    _gru_from_sd(sd, "rnn_parties", params, "rnn_parties", used)
    _set(params, ("smax_fc", "kernel"), _np(sd["smax_fc.weight"]).T, used)
    _set(params, ("smax_fc", "bias"), _np(sd["smax_fc.bias"]), used)


def _gdf_from_sd(sd: Mapping, params: Dict, used: set) -> int:
    """GDF/GF: GCNII stack (``model_GCN.py:412-433``)."""
    g = ("graph_model", "graph_net")
    _set(params, g + ("fc_in", "kernel"),
         _np(sd["graph_model.graph_net.fcs.0.weight"]).T, used)
    _set(params, g + ("fc_in", "bias"),
         _np(sd["graph_model.graph_net.fcs.0.bias"]), used)

    nlayers = np.asarray(
        params["graph_model"]["graph_net"]["conv_w"]).shape[0]
    conv = np.stack([_np(sd[f"graph_model.graph_net.convs.{i}.weight"])
                     for i in range(nlayers)])  # same orientation (torch.mm)
    _set(params, g + ("conv_w",), conv, used)

    if "reason_w_ih" in params["graph_model"]["graph_net"]:
        _set(params, g + ("reason_w_ih",),
             _np(sd["graph_model.graph_net.rnn.weight_ih_l0"]).T, used)
        _set(params, g + ("reason_w_hh",),
             _np(sd["graph_model.graph_net.rnn.weight_hh_l0"]).T, used)
        _set(params, g + ("reason_b_ih",),
             _np(sd["graph_model.graph_net.rnn.bias_ih_l0"]), used)
        _set(params, g + ("reason_b_hh",),
             _np(sd["graph_model.graph_net.rnn.bias_hh_l0"]), used)
    return nlayers


def _gf2_from_sd(sd: Mapping, params: Dict, used: set) -> int:
    """GF2: MM_GCN2's per-modal encoders are ``fcs[0]->a, fcs[1]->l,
    fcs[2]->v`` (``model_mm.py:224-234`` — note l before v) + the inline
    conv stack (64 layers hard-coded upstream, ``model.py:956``)."""
    for idx, m in ((0, "a"), (1, "l"), (2, "v")):
        _set(params, ("graph_model", f"fc_{m}", "kernel"),
             _np(sd[f"graph_model.fcs.{idx}.weight"]).T, used)
        _set(params, ("graph_model", f"fc_{m}", "bias"),
             _np(sd[f"graph_model.fcs.{idx}.bias"]), used)
    nlayers = np.asarray(
        params["graph_model"]["convs"]["conv_w"]).shape[0]
    conv = np.stack([_np(sd[f"graph_model.convs.{i}.weight"])
                     for i in range(nlayers)])  # same orientation (torch.mm)
    _set(params, ("graph_model", "convs", "conv_w"), conv, used)
    return nlayers


def _relation_from_sd(sd: Mapping, params: Dict, used: set) -> None:
    """Multimodal relation path: attn1 edge attention + three
    RGCNConv+GraphConv nets (``model.py:675-715,1183-1223``).  Orientations
    follow PyG-1.4.3: basis/root/GraphConv.weight apply ``matmul(x, W)`` —
    same as our (in, out) kernels — so only ``conv2.lin`` transposes."""
    _set(params, ("att_model", "scalar", "kernel"),
         _np(sd["att_model.scalar.weight"]).T, used)
    for m in ("a", "v", "l"):
        net, pre = f"graph_net_{m}", f"graph_net_{m}."
        _set(params, (net, "conv1", "basis"),
             _np(sd[pre + "conv1.basis"]), used)
        _set(params, (net, "conv1", "comp"),
             _np(sd[pre + "conv1.att"]), used)
        _set(params, (net, "conv1", "root"),
             _np(sd[pre + "conv1.root"]), used)
        _set(params, (net, "conv1", "bias"),
             _np(sd[pre + "conv1.bias"]), used)
        _set(params, (net, "conv2", "nbr", "kernel"),
             _np(sd[pre + "conv2.weight"]), used)
        _set(params, (net, "conv2", "root", "kernel"),
             _np(sd[pre + "conv2.lin.weight"]).T, used)
        _set(params, (net, "conv2", "root", "bias"),
             _np(sd[pre + "conv2.lin.bias"]), used)


def state_dict_to_params(sd: Mapping[str, Any], params: Mapping) -> Dict:
    """Map a reference ``DialogueGNNModel.state_dict()`` onto our flax tree.

    Args:
      sd: the torch state_dict (tensors or ndarrays) of a flagship GDF/GF,
        GF2, or multimodal-relation DialogueGNNModel; the family is
        auto-detected from the structure of ``params``.
      params: our initialized param tree (shape/structure template, e.g.
        ``Trainer(cfg).init_state().params``); not mutated.
    Returns:
      A new param tree with every live reference weight transplanted.
    Raises:
      KeyError / ValueError on unmapped live keys or shape mismatches —
      loud failure beats silently half-imported weights.
    """
    import jax
    try:                                   # FrozenDict on older flax configs
        from flax.core import unfreeze
        params = unfreeze(params)
    except ImportError:
        pass
    # tree_map rebuilds every container, so mutation below cannot alias the
    # caller's tree
    params = jax.tree_util.tree_map(np.asarray, params)
    used: set = set()
    family = _detect_family(params)

    _shared_from_sd(sd, params, used)
    nlayers = 0
    if family == "GDF":
        nlayers = _gdf_from_sd(sd, params, used)
    elif family == "GF2":
        nlayers = _gf2_from_sd(sd, params, used)
    else:
        _relation_from_sd(sd, params, used)

    # loud completeness check: every checkpoint key must be either imported
    # or known-dead; every one of OUR leaves must have been written
    imported_count = len(used)
    leaves = len(jax.tree_util.tree_leaves(params))
    if imported_count != leaves:
        raise ValueError(
            f"import covered {imported_count} of our {leaves} param leaves "
            f"({family}) — the model config does not match an architecture "
            "this importer supports (see module docstring)")
    stray = [k for k in sd
             if not k.startswith(FAMILY_IGNORED[family])
             and k not in _mapped_keys(family, nlayers)]
    if stray:
        raise KeyError(
            f"live reference parameters with no mapping ({family}): {stray} "
            "— the checkpoint was trained on a path this importer does not "
            "support (see module docstring for scope)")
    return params


def _mapped_keys(family: str, nlayers: int) -> set:
    keys = set()
    for m in ("a", "v", "l"):
        keys |= {f"linear_{m}.weight", f"linear_{m}.bias"}
    for name in ("lstm_l", "rnn_parties"):
        for layer in range(2):
            for suf in ("", "_reverse"):
                keys |= {f"{name}.weight_ih_l{layer}{suf}",
                         f"{name}.weight_hh_l{layer}{suf}",
                         f"{name}.bias_ih_l{layer}{suf}",
                         f"{name}.bias_hh_l{layer}{suf}"}
    keys |= {"smax_fc.weight", "smax_fc.bias"}
    if family == "GDF":
        keys |= {"graph_model.graph_net.fcs.0.weight",
                 "graph_model.graph_net.fcs.0.bias"}
        keys |= {f"graph_model.graph_net.convs.{i}.weight"
                 for i in range(nlayers)}
        keys |= {"graph_model.graph_net.rnn.weight_ih_l0",
                 "graph_model.graph_net.rnn.weight_hh_l0",
                 "graph_model.graph_net.rnn.bias_ih_l0",
                 "graph_model.graph_net.rnn.bias_hh_l0"}
    elif family == "GF2":
        keys |= {f"graph_model.fcs.{i}.{w}"
                 for i in range(3) for w in ("weight", "bias")}
        keys |= {f"graph_model.convs.{i}.weight" for i in range(nlayers)}
    else:
        keys.add("att_model.scalar.weight")
        for m in ("a", "v", "l"):
            keys |= {f"graph_net_{m}.conv1.basis",
                     f"graph_net_{m}.conv1.att",
                     f"graph_net_{m}.conv1.root",
                     f"graph_net_{m}.conv1.bias",
                     f"graph_net_{m}.conv2.weight",
                     f"graph_net_{m}.conv2.lin.weight",
                     f"graph_net_{m}.conv2.lin.bias"}
    return keys


def import_reference_checkpoint(obj_or_path, cfg) -> Any:
    """Load a reference checkpoint and return a fresh Trainer state with
    its weights.

    Args:
      obj_or_path: path to a ``torch.save`` file (whole-module pickle — the
        reference's format, ``run_train_erc.py:532`` — or a bare
        state_dict), OR an in-memory module / state_dict.
      cfg: ``ExperimentConfig`` matching the checkpoint's architecture.
    Returns:
      A ``TrainState`` whose params carry the imported weights (optimizer
      state freshly initialized — the reference never saved one).
    """
    from mmdfn_tpu.train import Trainer

    obj = obj_or_path
    if isinstance(obj, (str, bytes)):
        import torch
        # whole-module pickles reference the training script's module
        # namespace; weights_only=False is required (trusted input only)
        obj = torch.load(obj, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()

    trainer = Trainer(cfg)
    state = trainer.init_state()
    params = state_dict_to_params(obj, state.params)
    return state.replace(params=params)


def main(argv=None) -> int:
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--load_model", required=True,
                    help="reference torch.save file (whole-module pickle "
                         "or state_dict)")
    ap.add_argument("--out", required=True,
                    help="checkpoint directory to write (restore with "
                         "mmdfn_tpu.runtime.checkpoint.restore_checkpoint)")
    ap.add_argument("--dataset", default="IEMOCAP",
                    choices=["IEMOCAP", "MELD"])
    ap.add_argument("--graph_type", default="GDF",
                    choices=["GDF", "GF", "GF2", "relation"])
    ap.add_argument("--Deep_GCN_nlayers", type=int, default=16,
                    help="GDF/GF only (GF2 hard-codes 64 conv layers, "
                         "model.py:956; relation has none)")
    ap.add_argument("--no_use_residue", action="store_true",
                    help="GF2 only: the use_residue=False variant")
    ap.add_argument("--speaker_weights", type=str, default="3-0-1")
    args = ap.parse_args(argv)

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.runtime.checkpoint import save_checkpoint

    cfg = ExperimentConfig(
        dataset=args.dataset, graph_type=args.graph_type,
        reason_flag=(args.graph_type == "GDF"),
        Deep_GCN_nlayers=args.Deep_GCN_nlayers,
        use_residue=not args.no_use_residue,
        speaker_weights=args.speaker_weights)
    state = import_reference_checkpoint(args.load_model, cfg)
    import dataclasses
    path = save_checkpoint(args.out, state,
                           meta={"imported_from": args.load_model,
                                 "config": dataclasses.asdict(cfg)})
    print(json.dumps({"imported": args.load_model, "checkpoint": path}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
