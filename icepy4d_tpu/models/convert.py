"""Torch checkpoint -> JAX param-pytree converters.

The official pretrained checkpoints (superpoint_v1.pth, superglue_*.pth,
superpoint_lightglue.pth — ref thirdparty/SuperGlue/models/weights,
thirdparty/LightGlue/lightglue/lightglue.py:378) are torch state dicts.
These converters map them onto our flax/functional param layouts so the
TPU models are drop-in numerically identical. torch is imported lazily
and only needed at conversion time, never at inference.
"""

from __future__ import annotations

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv(sd: dict, name: str) -> dict:
    """torch Conv2d (O,I,kh,kw)/(O,) -> flax {'kernel': (kh,kw,I,O), 'bias'}."""
    return {
        "kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd[f"{name}.bias"]),
    }


def _linear(sd: dict, name: str) -> dict:
    """torch Linear (O,I)/(O,) -> flax {'kernel': (I,O), 'bias'}."""
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _conv1d_as_linear(sd: dict, name: str) -> dict:
    """torch Conv1d k=1 (O,I,1) -> flax Dense {'kernel': (I,O), 'bias'}."""
    out = {"kernel": _np(sd[f"{name}.weight"])[..., 0].T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def superpoint_params_from_torch(state_dict: dict) -> dict:
    """Map the SuperGlue-repo SuperPoint state dict (conv1a..convDb,
    ref thirdparty/SuperGlue/models/superpoint.py:104-130) onto
    models.superpoint.SuperPointNet params."""
    sd = {k: v for k, v in state_dict.items()}
    names = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
             "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]
    return {"params": {n: _conv(sd, n) for n in names}}


def load_torch_superpoint(path) -> dict:
    import torch

    return superpoint_params_from_torch(torch.load(path, map_location="cpu"))


# --------------------------------------------------------------------------
# LightGlue (ref thirdparty/LightGlue/lightglue/lightglue.py)
# --------------------------------------------------------------------------

def lightglue_params_from_torch(state_dict: dict, n_layers: int = 9) -> dict:
    """Map the LightGlue state dict onto models.lightglue param layout.

    torch names (lightglue.py:309-420):
      input_proj.{weight,bias}                      Linear D_in->256
      posenc.Wr.weight                              Fourier posenc (no bias)
      transformers.{i}.self_attn.Wqkv / out_proj / ffn.{0,3}
      transformers.{i}.cross_attn.to_qk / to_v / to_out / ffn.{0,3}
      log_assignment.{i}.matchability / final_proj
      token_confidence.{i}.token.0
    ffn layers interleave Linear+LayerNorm: ffn.0 Linear, ffn.1 LayerNorm,
    ffn.3 Linear.
    """
    sd = state_dict
    params: dict = {
        # input_proj is Identity when input_dim == descriptor_dim
        "input_proj": (_linear(sd, "input_proj")
                       if "input_proj.weight" in sd else {}),
        "posenc": {"Wr": {"kernel": _np(sd["posenc.Wr.weight"]).T}},
        "layers": [],
        "assign": [],
        "confidence": [],
    }

    def _ln(name):
        return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}

    def _ffn(prefix):
        return {
            "dense1": _linear(sd, f"{prefix}.0"),
            "norm": _ln(f"{prefix}.1"),
            "dense2": _linear(sd, f"{prefix}.3"),
        }

    for i in range(n_layers):
        s = f"transformers.{i}.self_attn"
        c = f"transformers.{i}.cross_attn"
        params["layers"].append({
            "self_attn": {
                "Wqkv": _linear(sd, f"{s}.Wqkv"),
                "out": _linear(sd, f"{s}.out_proj"),
                "ffn": _ffn(f"{s}.ffn"),
            },
            "cross_attn": {
                "to_qk": _linear(sd, f"{c}.to_qk"),
                "to_v": _linear(sd, f"{c}.to_v"),
                "out": _linear(sd, f"{c}.to_out"),
                "ffn": _ffn(f"{c}.ffn"),
            },
        })
        params["assign"].append({
            "matchability": _linear(sd, f"log_assignment.{i}.matchability"),
            "final_proj": _linear(sd, f"log_assignment.{i}.final_proj"),
        })
        if i < n_layers - 1:
            params["confidence"].append(
                {"token": _linear(sd, f"token_confidence.{i}.token.0")}
            )
    return params


def load_torch_lightglue(path, n_layers: int = 9) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu")
    return lightglue_params_from_torch(sd, n_layers)


# --------------------------------------------------------------------------
# SuperGlue (ref thirdparty/SuperGlue/models/superglue.py)
# --------------------------------------------------------------------------

def superglue_params_from_torch(state_dict: dict, n_layers: int = 18) -> dict:
    """Map the SuperGlue state dict onto models.superglue param layout.

    torch names (superglue.py:74-305, all Conv1d k=1 treated as Dense):
      kenc.encoder.{0,2,4,...}   keypoint-encoder MLP convs (+BN pairs)
      gnn.layers.{i}.attn.proj.{0,1,2}  q/k/v projections
      gnn.layers.{i}.attn.merge         head-merge conv
      gnn.layers.{i}.mlp.{0,2}          message MLP (+BN at 1... )
      final_proj                         1x1 conv
      bin_score                          scalar dustbin
    """
    sd = state_dict

    def _bn(name):
        return {
            "scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"]),
            "mean": _np(sd[f"{name}.running_mean"]),
            "var": _np(sd[f"{name}.running_var"]),
        }

    # keypoint encoder: MLP([3]+[32,64,128,256]+[256]) — Conv1d+BN+ReLU
    # stack; torch indices 0,1 (conv,bn), 3,4, 6,7, 9 (last conv no bn/relu)
    kenc_layers = []
    i = 0
    while f"kenc.encoder.{i}.weight" in sd:
        layer = {"dense": _conv1d_as_linear(sd, f"kenc.encoder.{i}")}
        if f"kenc.encoder.{i + 1}.running_mean" in sd:
            layer["bn"] = _bn(f"kenc.encoder.{i + 1}")
            i += 3
        else:
            i += 2
        kenc_layers.append(layer)

    layers = []
    for li in range(n_layers):
        g = f"gnn.layers.{li}"
        mlp_layers = []
        j = 0
        while f"{g}.mlp.{j}.weight" in sd:
            layer = {"dense": _conv1d_as_linear(sd, f"{g}.mlp.{j}")}
            if f"{g}.mlp.{j + 1}.running_mean" in sd:
                layer["bn"] = _bn(f"{g}.mlp.{j + 1}")
                j += 3
            else:
                j += 2
            mlp_layers.append(layer)
        layers.append({
            "q": _conv1d_as_linear(sd, f"{g}.attn.proj.0"),
            "k": _conv1d_as_linear(sd, f"{g}.attn.proj.1"),
            "v": _conv1d_as_linear(sd, f"{g}.attn.proj.2"),
            "merge": _conv1d_as_linear(sd, f"{g}.attn.merge"),
            "mlp": mlp_layers,
        })

    return {
        "kenc": kenc_layers,
        "gnn": layers,
        "final_proj": _conv1d_as_linear(sd, "final_proj"),
        "bin_score": float(_np(sd["bin_score"])),
    }


def load_torch_superglue(path, n_layers: int = 18) -> dict:
    import torch

    return superglue_params_from_torch(torch.load(path, map_location="cpu"),
                                       n_layers)


# ---------------------------------------------------------------------------
# Param persistence (converted checkpoints -> portable npz)
# ---------------------------------------------------------------------------

def save_params(path, params) -> None:
    """Save a JAX param pytree to one .npz (flat slash-joined keys)."""
    import numpy as np

    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            if not node:
                # keep empty dicts (e.g. LightGlue's identity
                # input_proj): dropping them breaks the reload
                flat[f"{prefix}/__empty_dict__" if prefix
                     else "__empty_dict__"] = np.zeros(0)
                return
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else str(k), v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    np.savez_compressed(path, **flat)


def bundled_checkpoint(name: str):
    """Path of a committed self-trained checkpoint (repo weights/<name>).

    The official pretrained weights are not downloadable in air-gapped
    deployments, so the repo ships self-trained replacements
    (scripts/train_superpoint.py, scripts/train_lightglue.py). Returns
    a pathlib.Path or None when the artifact is absent (e.g. a source
    tree before any training run)."""
    from pathlib import Path

    path = Path(__file__).resolve().parents[2] / "weights" / name
    return path if path.exists() else None


def load_params(path) -> dict:
    """Inverse of save_params; integer path segments rebuild lists."""
    import numpy as np

    data = np.load(path)
    root: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = root
        for p_, nxt in zip(parts[:-1], parts[1:]):
            node = node.setdefault(p_, {})
        node[parts[-1]] = data[key]

    def listify(node):
        if isinstance(node, dict):
            if list(node.keys()) == ["__empty_dict__"]:
                return {}
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


# --------------------------------------------------------------------------
# LoFTR (kornia.feature.LoFTR layout; official zju3dv checkpoints carry a
# "matcher." prefix which is stripped — ref matching/matchers.py:1012 loads
# KF.LoFTR(pretrained="outdoor"))
# --------------------------------------------------------------------------

def loftr_params_from_torch(state_dict: dict) -> dict:
    """Map a kornia-layout LoFTR state dict onto models.loftr params.

    Expected key families (kornia/feature/loftr):
      backbone.conv1/bn1, backbone.layer{1..3}.{0,1}.(conv*/bn*/downsample),
      backbone.layer{3,2,1}_outconv(2), loftr_coarse.layers.{0..7}.*,
      fine_preprocess.{down_proj,merge_feat}, loftr_fine.layers.{0,1}.*
    """
    import numpy as np

    sd = {}
    for k, v in state_dict.items():
        if k.startswith("matcher."):
            k = k[len("matcher."):]
        sd[k] = _np(v)

    def conv(name):
        return {"w": sd[f"{name}.weight"].transpose(2, 3, 1, 0)}

    def bn(name):
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"],
                "mean": sd[f"{name}.running_mean"],
                "var": sd[f"{name}.running_var"]}

    def block(name, has_down):
        p = {"conv1": conv(f"{name}.conv1"), "bn1": bn(f"{name}.bn1"),
             "conv2": conv(f"{name}.conv2"), "bn2": bn(f"{name}.bn2")}
        if has_down:
            p["down_conv"] = conv(f"{name}.downsample.0")
            p["down_bn"] = bn(f"{name}.downsample.1")
        return p

    def outconv2(name):
        return {"conv1": conv(f"{name}.0"), "bn": bn(f"{name}.1"),
                "conv2": conv(f"{name}.3")}

    backbone = {
        "conv1": conv("backbone.conv1"),
        "bn1": bn("backbone.bn1"),
        "layer1": [block("backbone.layer1.0", False),
                   block("backbone.layer1.1", False)],
        "layer2": [block("backbone.layer2.0", True),
                   block("backbone.layer2.1", False)],
        "layer3": [block("backbone.layer3.0", True),
                   block("backbone.layer3.1", False)],
        "layer3_outconv": conv("backbone.layer3_outconv"),
        "layer2_outconv": conv("backbone.layer2_outconv"),
        "layer2_outconv2": outconv2("backbone.layer2_outconv2"),
        "layer1_outconv": conv("backbone.layer1_outconv"),
        "layer1_outconv2": outconv2("backbone.layer1_outconv2"),
    }

    def lin(name):
        p = {"w": sd[f"{name}.weight"].T}
        if f"{name}.bias" in sd:
            p["b"] = sd[f"{name}.bias"]
        return p

    def enc_layer(name):
        return {
            "q_proj": lin(f"{name}.q_proj"),
            "k_proj": lin(f"{name}.k_proj"),
            "v_proj": lin(f"{name}.v_proj"),
            "merge": lin(f"{name}.merge"),
            "mlp0": lin(f"{name}.mlp.0"),
            "mlp2": lin(f"{name}.mlp.2"),
            "norm1": {"scale": sd[f"{name}.norm1.weight"],
                      "bias": sd[f"{name}.norm1.bias"]},
            "norm2": {"scale": sd[f"{name}.norm2.weight"],
                      "bias": sd[f"{name}.norm2.bias"]},
        }

    def stack_pairs(prefix, n_layers):
        # torch layer_names alternate ['self','cross']*k
        pairs = [{"self": enc_layer(f"{prefix}.layers.{2 * i}"),
                  "cross": enc_layer(f"{prefix}.layers.{2 * i + 1}")}
                 for i in range(n_layers // 2)]
        import jax.numpy as jnp

        return _tree_stack(pairs)

    def _tree_stack(pairs):
        def rec(*nodes):
            if isinstance(nodes[0], dict):
                return {k: rec(*[n[k] for n in nodes]) for k in nodes[0]}
            return np.stack(nodes)

        return rec(*pairs)

    n_coarse = len({k.split(".")[2] for k in sd
                    if k.startswith("loftr_coarse.layers.")})
    n_fine = len({k.split(".")[2] for k in sd
                  if k.startswith("loftr_fine.layers.")})
    return {
        "backbone": backbone,
        "coarse": stack_pairs("loftr_coarse", n_coarse),
        "fine_preprocess": {
            "down_proj": lin("fine_preprocess.down_proj"),
            "merge_feat": lin("fine_preprocess.merge_feat"),
        },
        "fine": stack_pairs("loftr_fine", n_fine),
    }


def load_torch_loftr(path) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu")
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return loftr_params_from_torch(ckpt)


# --------------------------------------------------------------------------
# DISK (kornia.feature.DISK thin U-Net; ref thirdparty/LightGlue/lightglue/
# disk.py:8-77 wraps it). The converter is STRUCTURAL: it groups state-dict
# entries by down/up block index and classifies within each block by shape
# (4-D .weight = conv kernel, its .bias = conv bias, any other 1-D .weight =
# PReLU slope), so it tolerates submodule-naming differences between kornia
# releases. Offline we cannot pin kornia's exact key strings; parity vs the
# architecture itself is tested in tests/test_disk.py.
# --------------------------------------------------------------------------

def disk_params_from_torch(state_dict: dict) -> dict:
    import re

    blocks: dict[tuple, dict] = {}
    for key, val in state_dict.items():
        m = re.search(r"path_(down|up)\.(\d+)\.", key)
        if m is None:
            continue
        blk = blocks.setdefault((m.group(1), int(m.group(2))), {})
        arr = _np(val)
        if key.endswith(".weight") and arr.ndim == 4:
            blk["w"] = arr.transpose(2, 3, 1, 0)
            blk["_conv_prefix"] = key[: -len(".weight")]
        elif key.endswith(".weight") and arr.ndim == 1:
            blk["alpha"] = arr
        elif key.endswith(".bias") and arr.ndim == 1:
            blk.setdefault("_biases", {})[key[: -len(".bias")]] = arr

    def finish(blk):
        biases = blk.pop("_biases", {})
        prefix = blk.pop("_conv_prefix", None)
        if prefix is not None and prefix in biases:
            blk["b"] = biases[prefix]
        elif biases:
            # single remaining bias belongs to the conv
            blk["b"] = next(iter(biases.values()))
        if "alpha" in blk and blk["alpha"].shape[0] == 1:
            blk["alpha"] = np.broadcast_to(
                blk["alpha"], (blk["w"].shape[2],)).copy()
        return blk

    n_down = 1 + max(i for (d, i) in blocks if d == "down")
    n_up = 1 + max(i for (d, i) in blocks if d == "up")
    return {
        "down": [finish(blocks[("down", i)]) for i in range(n_down)],
        "up": [finish(blocks[("up", i)]) for i in range(n_up)],
    }


def load_torch_disk(path) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu")
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if isinstance(ckpt, dict) and "extractor" in ckpt:
        ckpt = ckpt["extractor"]
    return disk_params_from_torch(ckpt)
