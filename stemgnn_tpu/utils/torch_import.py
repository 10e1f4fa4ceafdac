"""Reference (PyTorch) checkpoint importer.

Maps the reference's ``state_dict`` layouts onto this framework's param/state
pytrees so per-layer activation-parity tests and finetuning from reference
checkpoints work (BASELINE.json north star; save format:
STEM-GNN/pretrain.py:160-165 saves ``encoder_{i}.pt`` / ``vq_{i}.pt``).

Key conventions translated:
  * torch ``nn.Linear.weight`` is [out, in]; ours is [in, out] -> transpose,
  * PyG Linear inside MySAGEConv: same,
  * BatchNorm running stats land in the *state* tree,
  * VQ buffers (``_codebook.embed`` [H, C, d], ``embed_avg``,
    ``cluster_size``, ``initted``) map to vq params['embed'] + state.

Accepts either a real ``.pt`` file (torch required) or an already-loaded
mapping of numpy arrays keyed by state_dict names.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

import jax.numpy as jnp

from stemgnn_tpu.core.config import EncoderConfig, VQConfig


def load_state_dict(path_or_dict) -> Dict[str, np.ndarray]:
    if isinstance(path_or_dict, Mapping):
        return {k: np.asarray(v) for k, v in path_or_dict.items()}
    import torch
    sd = torch.load(path_or_dict, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _lin(sd, prefix, bias=True):
    p = {"w": jnp.asarray(sd[prefix + ".weight"].T)}
    if bias and prefix + ".bias" in sd:
        p["b"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def import_encoder(path_or_dict, cfg: EncoderConfig):
    """Returns (params, state) matching nn.encoder.encoder_init layout."""
    sd = load_state_dict(path_or_dict)
    flags = cfg.moe_layer_flags()
    layers, norms_p, norms_s, env_encoders = [], [], [], []
    env_idx = 0
    for i in range(cfg.num_layers):
        if flags[i] and cfg.backbone == "sage":
            layers.append({"weights": jnp.asarray(sd[f"layers.{i}.weights"])})
            env_encoders.append(_lin(sd, f"env_encoders.{env_idx}"))
            env_idx += 1
        elif cfg.backbone == "sage":
            layers.append({
                "lin_l": _lin(sd, f"layers.{i}.lin_l"),
                "lin_r": _lin(sd, f"layers.{i}.lin_r", bias=False),
            })
        elif cfg.backbone == "gin":
            layers.append({"lin": _lin(sd, f"layers.{i}.nn"),
                           "eps": jnp.asarray(sd.get(f"layers.{i}.eps", 0.0))})
        elif cfg.backbone == "gcn":
            layers.append({"lin": _lin(sd, f"layers.{i}.lin", bias=False),
                           "bias": jnp.asarray(sd[f"layers.{i}.bias"])})
        else:
            raise NotImplementedError(
                f"import for backbone {cfg.backbone} layer {i}")
        norms_p.append({"scale": jnp.asarray(sd[f"norms.{i}.weight"]),
                        "bias": jnp.asarray(sd[f"norms.{i}.bias"])})
        norms_s.append({
            "mean": jnp.asarray(sd[f"norms.{i}.running_mean"]),
            "var": jnp.asarray(sd[f"norms.{i}.running_var"]),
            "count": jnp.asarray(
                sd.get(f"norms.{i}.num_batches_tracked", 0)).astype(jnp.int32),
        })
    params = {"layers": layers, "norms": norms_p,
              "env_encoders": env_encoders}
    return params, {"norms": norms_s}


def import_vq(path_or_dict, cfg: VQConfig):
    """Returns (params, state) matching vq.quantize.vq_init layout."""
    sd = load_state_dict(path_or_dict)
    params = {}
    if "project_in.weight" in sd:
        params["project_in"] = _lin(sd, "project_in")
        params["project_out"] = _lin(sd, "project_out")
    params["embed"] = jnp.asarray(sd["_codebook.embed"])
    state = {
        "embed_avg": jnp.asarray(sd.get("_codebook.embed_avg",
                                        sd["_codebook.embed"])),
        "cluster_size": jnp.asarray(sd.get(
            "_codebook.cluster_size",
            np.zeros(params["embed"].shape[:2]))),
        "initted": jnp.asarray(bool(np.asarray(
            sd.get("_codebook.initted", [True])).reshape(-1)[0])),
    }
    return params, state


def import_task_decoder(path_or_dict):
    sd = load_state_dict(path_or_dict)
    return _lin(sd, "decoder")


def import_pretrain_model(path_or_dict, enc_cfg: EncoderConfig,
                          vq_cfg: VQConfig):
    """Import a full PretrainModel state_dict (pt_model.py:11-23 layout) into
    (params, teacher_params, state)."""
    sd = load_state_dict(path_or_dict)

    def sub(prefix):
        plen = len(prefix)
        return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}

    enc_p, enc_s = import_encoder(sub("encoder."), enc_cfg)
    vq_p, vq_s = import_vq(sub("vq."), vq_cfg)
    teacher_p, teacher_s = import_encoder(sub("sem_encoder."), enc_cfg)
    params = {
        "encoder": enc_p, "vq": vq_p,
        "feat_dec": _lin(sd, "feat_recon_decoder"),
        "topo_dec": ({"lin": _lin(sd, "topo_recon_decoder.lin")}
                     if "topo_recon_decoder.lin.weight" in sd else {}),
        "topo_sem_dec": _lin(sd, "topo_sem_recon_decoder"),
        "sem_projector": _lin(sd, "sem_projector"),
    }
    state = {"encoder": enc_s, "vq": vq_s, "sem_encoder": teacher_s}
    return params, teacher_p, state
