"""Import a reference (PyTorch) MM-DFN checkpoint into this framework.

The reference's only checkpoint format is a WHOLE-MODULE pickle: training
never saves (zero ``torch.save`` calls in ``code/``), and test mode loads
``model = torch.load(args.load_model)`` (``run_train_erc.py:532``).  A user
migrating from the reference therefore arrives with either such a pickle or
a ``state_dict`` they extracted themselves.  This tool converts both into
our flax parameter tree so a trained reference model can be served/evaluated
(or fine-tuned) here without retraining.

Scope: every family the reference trainer can save — the family is
auto-detected from OUR param-tree template, so the config decides:

* ``DialogueGNNModel`` graph types GDF/GF (flagship GCNII), GF2 (MM_GCN2),
  multimodal ``relation`` (RGCN+GraphConv, with or without ``--use_gcn``'s
  degenerate conv3/conv4 linears — DESIGN.md) and its single-stream
  variant (``att_type='concat'``, ``model.py:819-824``), ``DeepGCN``
  (three per-modality GCNII baselines, ``model.py:930-940``), ``GCN3``
  (two GCNLayer1 over the speaker chain, ``model.py:910-921``), and
  ``'None'`` (per-modality linear + fusion head, ``model.py:960-976``) —
  each with any fusion head the forward actually runs
  (``gated``/``tfn_only``/``lmf_only``/``mfn`` params are mapped whenever
  OUR tree allocates them), with or without ``--av_using_lstm``
  (``lstm_a``/``lstm_v`` encoders).
* the non-graph baselines the reference trains with ``--graph_model``
  false: ``GRUModel``/``LSTMModel`` (``model.py:281-356``) and
  ``DialogRNNModel`` (``model.py:359-417``, simple/general context
  attention, optional active listener).

Parameters the reference allocates but never uses on a given path
(``a_fc`` & co, ``model_mm.py:55-75``; ``att_model`` off the relation
path; embeddings gated off by ``use_speaker/use_modal=False``; unused
fusion heads; ``MFN.out_fc*``) are ignored, mirroring the forward —
see :func:`_dead_prefixes`.

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

class _TrackedSD:
    """Dict view over the checkpoint that records every key consumed, so
    the stray-key check below is exact for every family (a live reference
    weight the mapping forgot shows up as unread, not silently dropped)."""

    def __init__(self, sd: Mapping):
        self._sd = sd
        self.read: set = set()

    def __getitem__(self, k):
        self.read.add(k)
        return self._sd[k]

    def __contains__(self, k):
        return k in self._sd

    def keys(self):
        return self._sd.keys()


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


def _dead_prefixes(family: str, params: Mapping) -> tuple:
    """state_dict prefixes the given path never runs (mirrors the oracle's
    DEAD_PREFIXES / RELATION_DEAD sets in tests/test_reference_oracle.py,
    computed from OUR template so e.g. an allocated-but-unused fusion head
    or reason-LSTM is dead exactly when our tree lacks it)."""
    if family in ("GRU", "LSTM", "DialogRNN"):
        return ()                    # the baselines run every parameter
    if family in ("relation", "relation_single"):
        # att_model.scalar IS live on the relation path (attn1 edge
        # weights, model.py:445); the other branches are dead there
        dead = ["att_model.matchatt.", "att_model.simpleatt.",
                "att_model.att."]
        for m in "avl":
            g = params.get(f"graph_net_{m}", {})
            # multimodal nets return features before the in-net classifier
            # runs; with use_GCN the reference still allocates the wider
            # linear/matchatt (model.py:693-694) — dead iff our tree
            # (return_feature=True) lacks them
            if "linear" not in g:
                dead += [f"graph_net_{m}.linear.",
                         f"graph_net_{m}.matchatt."]
    else:
        dead = ["att_model."]        # MaskedEdgeAttention, relation-only
    if "gatedatt" not in params:     # allocated unconditionally
        dead.append("gatedatt.")     # (model.py:983), run iff att_type
    if "mfn" in params:              # MFN.out_fc* allocated-never-run
        dead += ["mfn.out_fc1.", "mfn.out_fc2."]   # (model_fusion.py:58-60)
    if family == "GDF":
        dead += ["graph_model.a_fc.", "graph_model.v_fc.",
                 "graph_model.l_fc.", "graph_model.feature_fc.",
                 "graph_model.final_fc.", "graph_model.modal_embeddings.",
                 "graph_model.speaker_embeddings.", "graph_model.a_spk_embs.",
                 "graph_model.v_spk_embs.", "graph_model.l_spk_embs.",
                 # GCNII_lyc allocates the reason-LSTM unconditionally
                 # (model_GCN.py:433); with reason_flag=False it never runs
                 "graph_model.graph_net.rnn."]
    elif family == "DeepGCN":
        if "reason_w_ih" not in params["graph_net_a"]["stack"]:
            dead += [f"graph_net_{m}.rnn." for m in "avl"]
    elif family == "GCN3":
        # GCN_2Layers allocates a classifier head it never runs when
        # return_feature=True (model_GCN.py:136,149-151)
        dead += [f"graph_net_{m}.linear." for m in "avl"]
    return tuple(dead)


def _detect_family(params: Mapping) -> str:
    """Infer the checkpoint family from OUR param-tree template."""
    gm = params.get("graph_model", {})
    if "graph_net" in gm:
        return "GDF"                 # GDF/GF share the MM_GCN/GCNII tree
    if "convs" in gm:
        return "GF2"                 # MM_GCN2 (model_mm.py:219-258)
    g = params.get("graph_net_a")
    if g is not None:
        if "stack" in g:
            return "DeepGCN"         # per-modality GCNII (model.py:930-940)
        if "gcn1" in g:
            return "GCN3"            # GCN_2Layers (model_GCN.py:121-154)
        if "conv1" in g:
            return "relation"        # three RGCN+GraphConv nets
        if "kernel" in g:
            return "None"            # per-modality linear (model.py:960-976)
    g = params.get("graph_net")
    if g is not None and "conv1" in g:
        return "relation_single"     # att_type='concat' (model.py:819-824)
    if "head" in params:             # non-graph baselines (graph_model=False)
        if "gru" in params:
            return "GRU"
        if "lstm" in params:
            return "LSTM"
        if "dialog_rnn_f" in params:
            return "DialogRNN"
    raise ValueError(
        "unrecognized param-tree template: expected a DialogueGNNModel "
        "family (GDF/GF, GF2, relation, DeepGCN, GCN3, 'None') or a "
        "non-graph baseline (GRU/LSTM/DialogRNN) — see module docstring")


def _shared_from_sd(sd: Mapping, params: Dict, used: set) -> None:
    """Encoders + head shared by every DialogueGNNModel family
    (``model.py:853-868,949-954``): modality projections, text bi-GRU,
    CRN party bi-GRU (and the ``--av_using_lstm`` audio/visual bi-GRUs
    when our tree allocates them), smax head."""
    for m in ("a", "v", "l"):
        if f"linear_{m}" not in params:   # modal subset: skipped nets'
            continue                       # checkpoint keys fail the stray
        _set(params, (f"linear_{m}", "kernel"),   # check with the full list
             _np(sd[f"linear_{m}.weight"]).T, used)
        _set(params, (f"linear_{m}", "bias"),
             _np(sd[f"linear_{m}.bias"]), used)
    for name in ("lstm_l", "rnn_parties", "lstm_a", "lstm_v"):
        if name in params:           # lstm_a/lstm_v exist iff av_using_lstm
            _gru_from_sd(sd, name, params, name, used)
    _set(params, ("smax_fc", "kernel"), _np(sd["smax_fc.weight"]).T, used)
    _set(params, ("smax_fc", "bias"), _np(sd["smax_fc.bias"]), used)


def _dense_from_sd(sd: Mapping, prefix: str, tree: Mapping, path: tuple,
                   params: Dict, used: set) -> None:
    """Generic torch->flax mapping for subtrees whose module names match
    the reference 1:1 (the inverse of the oracle's ``_dense_tree_entries``):
    ``{kernel, bias}`` children map from ``nn.Linear`` weight/bias, bare
    leaves map verbatim (e.g. LMF factors)."""
    for k, v in tree.items():
        sub = path + (k,)
        if isinstance(v, dict) and "kernel" in v:
            _set(params, sub + ("kernel",),
                 _np(sd[f"{prefix}{k}.weight"]).T, used)
            if "bias" in v:
                _set(params, sub + ("bias",),
                     _np(sd[f"{prefix}{k}.bias"]), used)
        elif isinstance(v, dict):
            _dense_from_sd(sd, f"{prefix}{k}.", v, sub, params, used)
        else:
            _set(params, sub, _np(sd[f"{prefix}{k}"]), used)


def _fusion_from_sd(sd: Mapping, params: Dict, used: set) -> None:
    """Fusion heads (mapped for ANY family whose tree allocates them):
    gated MMGatedAttention / TFN / LMF via the 1:1 dense mapping, MFN via
    its flat param names (nn/fusion.py:50-68 vs model_fusion.py:37-60)."""
    for key in ("gatedatt", "tfn", "lmf"):
        if key in params:
            _dense_from_sd(sd, f"{key}.", params[key], (key,), params, used)
    if "mfn" in params:
        p = params["mfn"]
        for m in ("l", "a", "v"):
            _set(params, ("mfn", f"lstm_{m}_w_ih"),
                 _np(sd[f"mfn.lstm_{m}.weight_ih"]).T, used)
            _set(params, ("mfn", f"lstm_{m}_w_hh"),
                 _np(sd[f"mfn.lstm_{m}.weight_hh"]).T, used)
            _set(params, ("mfn", f"lstm_{m}_b_ih"),
                 _np(sd[f"mfn.lstm_{m}.bias_ih"]), used)
            _set(params, ("mfn", f"lstm_{m}_b_hh"),
                 _np(sd[f"mfn.lstm_{m}.bias_hh"]), used)
        for fc in ("att1_fc1", "att1_fc2", "att2_fc1", "att2_fc2",
                   "gamma1_fc1", "gamma1_fc2", "gamma2_fc1", "gamma2_fc2"):
            if f"{fc}_kernel" in p:
                _set(params, ("mfn", f"{fc}_kernel"),
                     _np(sd[f"mfn.{fc}.weight"]).T, used)
                _set(params, ("mfn", f"{fc}_bias"),
                     _np(sd[f"mfn.{fc}.bias"]), used)


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


def _relation_net_from_sd(sd: Mapping, params: Dict, used: set,
                          net: str) -> None:
    """One RGCNConv+GraphConv net (``model.py:675-715``).  Orientations
    follow PyG-1.4.3: basis/root/GraphConv.weight apply ``matmul(x, W)`` —
    same as our (in, out) kernels — so only ``conv2.lin`` transposes."""
    pre = f"{net}."
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
    # --use_gcn: conv3/conv4 are plain linears (the upstream "GCN
    # branch" runs an identity adjacency — DESIGN.md faithful quirk)
    if "conv3" in params[net]:
        for conv in ("conv3", "conv4"):
            _set(params, (net, conv, "kernel"),
                 _np(sd[pre + f"{conv}.linear.weight"]).T, used)
            _set(params, (net, conv, "bias"),
                 _np(sd[pre + f"{conv}.linear.bias"]), used)


def _relation_from_sd(sd: Mapping, params: Dict, used: set) -> None:
    """Multimodal relation path: attn1 edge attention + three
    RGCNConv+GraphConv nets (``model.py:675-715,1183-1223``)."""
    _set(params, ("att_model", "scalar", "kernel"),
         _np(sd["att_model.scalar.weight"]).T, used)
    for m in ("a", "v", "l"):
        if f"graph_net_{m}" not in params:   # modal subset (cf. _none)
            continue
        _relation_net_from_sd(sd, params, used, f"graph_net_{m}")


def _relation_single_from_sd(sd: Mapping, params: Dict, used: set) -> None:
    """Single-stream relation (att_type='concat' flips multi_modal off,
    ``model.py:819-824``): its OWN encoder layout — one ``linear_``
    projection + ``lstm`` text bi-GRU (``model.py:842-851,1040-1072``) —
    and one GraphNetwork carrying the full in-net classifier
    (``classify_node_features``, ``model.py:647-672``)."""
    _set(params, ("linear_", "kernel"), _np(sd["linear_.weight"]).T, used)
    _set(params, ("linear_", "bias"), _np(sd["linear_.bias"]), used)
    for name in ("lstm", "rnn_parties"):
        if name in params:
            _gru_from_sd(sd, name, params, name, used)
    _set(params, ("att_model", "scalar", "kernel"),
         _np(sd["att_model.scalar.weight"]).T, used)
    _relation_net_from_sd(sd, params, used, "graph_net")
    head = {k: v for k, v in params["graph_net"].items()
            if k in ("matchatt", "linear", "smax_fc")}
    _dense_from_sd(sd, "graph_net.", head, ("graph_net",), params, used)


def _deepgcn_from_sd(sd: Mapping, params: Dict, used: set) -> None:
    """graph_type='DeepGCN': three per-modality GCNII stacks
    (``model.py:930-940``, ``model_GCN.py:224-285``) — fcs.0, the stacked
    per-layer conv weights, and the shared reason-LSTM when our tree runs
    it (reason_flag)."""
    for m in ("a", "v", "l"):
        if f"graph_net_{m}" not in params:   # modal subset (cf. _none)
            continue
        g = (f"graph_net_{m}", "stack")
        node = params[f"graph_net_{m}"]["stack"]
        _set(params, g + ("fc_in", "kernel"),
             _np(sd[f"graph_net_{m}.fcs.0.weight"]).T, used)
        _set(params, g + ("fc_in", "bias"),
             _np(sd[f"graph_net_{m}.fcs.0.bias"]), used)
        nlayers = np.asarray(node["conv_w"]).shape[0]
        conv = np.stack([_np(sd[f"graph_net_{m}.convs.{i}.weight"])
                         for i in range(nlayers)])
        _set(params, g + ("conv_w",), conv, used)
        if "reason_w_ih" in node:
            _set(params, g + ("reason_w_ih",),
                 _np(sd[f"graph_net_{m}.rnn.weight_ih_l0"]).T, used)
            _set(params, g + ("reason_w_hh",),
                 _np(sd[f"graph_net_{m}.rnn.weight_hh_l0"]).T, used)
            _set(params, g + ("reason_b_ih",),
                 _np(sd[f"graph_net_{m}.rnn.bias_ih_l0"]), used)
            _set(params, g + ("reason_b_hh",),
                 _np(sd[f"graph_net_{m}.rnn.bias_hh_l0"]), used)


def _gcn3_from_sd(sd: Mapping, params: Dict, used: set) -> None:
    """graph_type='GCN3': two GCNLayer1 per modality over the directed
    speaker chain (``model.py:910-921``, ``model_GCN.py:121-154``); each
    layer is one linear."""
    for m in ("a", "v", "l"):
        if f"graph_net_{m}" not in params:   # modal subset (cf. _none)
            continue
        for layer in ("gcn1", "gcn2"):
            _set(params, (f"graph_net_{m}", layer, "TorchDense_0", "kernel"),
                 _np(sd[f"graph_net_{m}.{layer}.linear.weight"]).T, used)
            _set(params, (f"graph_net_{m}", layer, "TorchDense_0", "bias"),
                 _np(sd[f"graph_net_{m}.{layer}.linear.bias"]), used)


def _none_from_sd(sd: Mapping, params: Dict, used: set) -> None:
    """graph_type='None': a bare per-modality linear
    (``model.py:960-976``); the fusion head is mapped separately."""
    for m in ("a", "v", "l"):
        if f"graph_net_{m}" not in params:
            continue
        _set(params, (f"graph_net_{m}", "kernel"),
             _np(sd[f"graph_net_{m}.weight"]).T, used)
        _set(params, (f"graph_net_{m}", "bias"),
             _np(sd[f"graph_net_{m}.bias"]), used)


def _basic_recurrent_from_sd(sd: Mapping, params: Dict, used: set,
                             kind: str) -> None:
    """GRUModel/LSTMModel (``model.py:281-356``): the 2-layer bi-recurrence
    (torch LSTM/GRU state_dicts share the key layout) + the attention
    classifier head, whose child names match the reference top level."""
    _gru_from_sd(sd, kind, params, kind, used)
    _dense_from_sd(sd, "", params["head"], ("head",), params, used)


def _dialogrnn_from_sd(sd: Mapping, params: Dict, used: set) -> None:
    """DialogRNNModel (``model.py:359-417``): forward/reverse DialogueRNN
    cell stacks (party/global/emotion GRUCells + optional listener cell +
    simple/general context attention) + the shared classifier head."""
    for d in ("dialog_rnn_f", "dialog_rnn_r"):
        cell = params[d]["cell"]
        for c in ("g_cell", "p_cell", "e_cell", "l_cell"):
            if c not in cell:
                continue
            _set(params, (d, "cell", c, "w_ih"),
                 _np(sd[f"{d}.dialogue_cell.{c}.weight_ih"]).T, used)
            _set(params, (d, "cell", c, "w_hh"),
                 _np(sd[f"{d}.dialogue_cell.{c}.weight_hh"]).T, used)
            _set(params, (d, "cell", c, "b_ih"),
                 _np(sd[f"{d}.dialogue_cell.{c}.bias_ih"]), used)
            _set(params, (d, "cell", c, "b_hh"),
                 _np(sd[f"{d}.dialogue_cell.{c}.bias_hh"]), used)
        if "att_scalar" in cell:     # context_attention='simple'
            _set(params, (d, "cell", "att_scalar", "kernel"),
                 _np(sd[f"{d}.dialogue_cell.attention.scalar.weight"]).T,
                 used)
        if "att_transform" in cell:  # context_attention='general'
            _set(params, (d, "cell", "att_transform", "kernel"),
                 _np(sd[f"{d}.dialogue_cell.attention.transform.weight"]).T,
                 used)
    _dense_from_sd(sd, "", params["head"], ("head",), params, used)


def state_dict_to_params(sd: Mapping[str, Any], params: Mapping) -> Dict:
    """Map a reference ``DialogueGNNModel.state_dict()`` onto our flax tree.

    Args:
      sd: the torch state_dict (tensors or ndarrays) of any supported
        family (see module docstring); the family is auto-detected from
        the structure of ``params``.
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
    sd = _TrackedSD(sd)

    if family in ("GRU", "LSTM"):
        _basic_recurrent_from_sd(sd, params, used, family.lower())
    elif family == "DialogRNN":
        _dialogrnn_from_sd(sd, params, used)
    elif family == "relation_single":
        _relation_single_from_sd(sd, params, used)
    else:
        _shared_from_sd(sd, params, used)
        if family == "GDF":
            _gdf_from_sd(sd, params, used)
        elif family == "GF2":
            _gf2_from_sd(sd, params, used)
        elif family == "relation":
            _relation_from_sd(sd, params, used)
        elif family == "DeepGCN":
            _deepgcn_from_sd(sd, params, used)
        elif family == "GCN3":
            _gcn3_from_sd(sd, params, used)
        else:                              # 'None': per-modality linear
            _none_from_sd(sd, params, used)
        _fusion_from_sd(sd, params, used)  # whatever head our tree runs

    # loud completeness check: every checkpoint key must be either imported
    # or known-dead; every one of OUR leaves must have been written
    imported_count = len(used)
    leaves = len(jax.tree_util.tree_leaves(params))
    if imported_count != leaves:
        raise ValueError(
            f"import covered {imported_count} of our {leaves} param leaves "
            f"({family}) — the model config does not match an architecture "
            "this importer supports (see module docstring)")
    dead = _dead_prefixes(family, params)
    stray = [k for k in sd.keys()
             if k not in sd.read and not (dead and k.startswith(dead))]
    if stray:
        raise KeyError(
            f"live reference parameters with no mapping ({family}): {stray} "
            "— the checkpoint was trained on a path this importer does not "
            "support (see module docstring for scope)")
    return params


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
                    choices=["GDF", "GF", "GF2", "relation", "DeepGCN",
                             "GCN3", "None"])
    ap.add_argument("--Deep_GCN_nlayers", type=int, default=16,
                    help="GDF/GF/DeepGCN (GF2 hard-codes 64 conv layers, "
                         "model.py:956; relation/GCN3/None have none)")
    ap.add_argument("--no_use_residue", action="store_true",
                    help="the use_residue=False variant")
    ap.add_argument("--speaker_weights", type=str, default="3-0-1")
    ap.add_argument("--reason_flag", choices=["auto", "true", "false"],
                    default="auto",
                    help="reason-LSTM inside the GCNII stacks; 'auto' = on "
                         "for GDF, off otherwise (DeepGCN supports both)")
    ap.add_argument("--mm_fusion_mthd", default="concat_subsequently",
                    choices=["concat_subsequently", "concat_only", "gated",
                             "tfn_only", "lmf_only", "mfn_only", "mfn"],
                    help="fusion head the checkpoint was trained with")
    ap.add_argument("--av_using_lstm", action="store_true",
                    help="checkpoint has lstm_a/lstm_v encoders")
    ap.add_argument("--use_gcn", action="store_true",
                    help="relation: checkpoint trained with --use_gcn "
                         "(conv3/conv4 linears)")
    ap.add_argument("--no_graph_model", dest="graph_model",
                    action="store_false", default=True,
                    help="non-graph baseline checkpoint (GRUModel/"
                         "LSTMModel/DialogRNNModel); pick with --base_model")
    ap.add_argument("--base_model", default="LSTM",
                    choices=["LSTM", "GRU", "DialogRNN"])
    ap.add_argument("--active_listener", action="store_true",
                    help="DialogRNN: listener-state variant")
    ap.add_argument("--attention", default="general",
                    choices=["simple", "general"],
                    help="DialogRNN context attention")
    args = ap.parse_args(argv)

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.runtime.checkpoint import save_checkpoint

    reason = ((args.graph_type == "GDF") if args.reason_flag == "auto"
              else args.reason_flag == "true")
    cfg = ExperimentConfig(
        dataset=args.dataset, graph_type=args.graph_type,
        graph_model=args.graph_model, base_model=args.base_model,
        reason_flag=reason,
        Deep_GCN_nlayers=args.Deep_GCN_nlayers,
        use_residue=not args.no_use_residue,
        speaker_weights=args.speaker_weights,
        mm_fusion_mthd=args.mm_fusion_mthd,
        av_using_lstm=args.av_using_lstm, use_gcn=args.use_gcn,
        active_listener=args.active_listener,
        attention=args.attention)
    state = import_reference_checkpoint(args.load_model, cfg)
    import dataclasses
    path = save_checkpoint(args.out, state,
                           meta={"imported_from": args.load_model,
                                 "config": dataclasses.asdict(cfg)})
    print(json.dumps({"imported": args.load_model, "checkpoint": path}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
