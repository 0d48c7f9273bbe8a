"""Checkpoint interchange with the reference's torch format.

The reference saves ``{'model', 'optimizer', 'discriminator',
'discriminator_optimizer'}`` via torch.save (reference bin/train.py:235-247)
and publishes ``{'model', 'pattern'}`` (bin/publish.py:71-74).  This module:

  * builds the deterministic torch-key <-> flax-path map for every model
    (construction order is fully determined by the config);
  * converts torch state_dicts -> flax param trees and back, including the
    weight-norm (weight_v, weight_g) <-> (kernel, g/gt) reparameterization
    and the NCT -> NTC kernel transposes;
  * fuses weight norm into plain kernels for inference (the reference's
    ``remove_weight_norm()``, melgan.py:138-147).

Framework-native checkpoints are torch.load-compatible files whose 'model' /
'discriminator' entries use the reference key layout verbatim.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from fastvocoder_tpu.hparams import (
    BasisMelGANConfig,
    HiFiGANConfig,
    MelGANConfig,
    ModelConfig,
)

FlaxPath = Tuple[str, ...]


@dataclasses.dataclass(frozen=True)
class MapEntry:
    torch_prefix: str       # e.g. "melgan.1" (keys: .weight_v/.weight_g/.bias)
    flax_path: FlaxPath     # e.g. ("conv_pre",)
    kind: str               # "conv" | "convT" | "conv2d" | "basis"
    bias: bool = True
    weight_norm: bool = True


# ---------------------------------------------------------------------------
# Key-map builders (construction order == torch registration order)
# ---------------------------------------------------------------------------


def _melgan_stack_entries(
    prefix: str, flax_prefix: FlaxPath, causal: bool, bias: bool, wn: bool
) -> List[MapEntry]:
    """ResidualStack keys (reference modules.py:350-370): non-causal stack =
    Sequential(act, pad, conv, act, conv1x1) -> stack.2 / stack.4; causal =
    Sequential(act, CausalConv1d, act, conv1x1) -> stack.1.conv / stack.3."""
    if not causal:
        dil = f"{prefix}.stack.2"
        one = f"{prefix}.stack.4"
        dil_path = flax_prefix + ("conv_dilated",)
    else:
        dil = f"{prefix}.stack.1.conv"
        one = f"{prefix}.stack.3"
        dil_path = flax_prefix + ("conv_dilated", "conv")
    return [
        MapEntry(dil, dil_path, "conv", bias, wn),
        MapEntry(one, flax_prefix + ("conv_1x1",), "conv", bias, wn),
        MapEntry(f"{prefix}.skip_layer", flax_prefix + ("skip",), "conv", bias, wn),
    ]


def _melgan_trunk_entries(
    seq_name: str,
    channels: Sequence[int],
    scales: Sequence[int],
    stacks: int,
    causal: bool,
    bias: bool,
    wn: bool,
    transposedconv: bool = True,
    with_last_layer: bool = True,
) -> List[MapEntry]:
    entries = [MapEntry(f"{seq_name}.1", ("conv_pre",), "conv", bias, wn)]
    per_scale = 2 + stacks
    for i, _ in enumerate(scales):
        base = 2 + i * per_scale
        if transposedconv:
            entries.append(
                MapEntry(f"{seq_name}.{base + 1}", (f"up_{i}",), "convT", bias, wn)
            )
        else:
            entries.append(
                MapEntry(
                    f"{seq_name}.{base + 1}.conv", (f"up_{i}", "conv"), "conv", bias, wn
                )
            )
        for j in range(stacks):
            entries += _melgan_stack_entries(
                f"{seq_name}.{base + 2 + j}", (f"stack_{i}_{j}",), causal, bias, wn
            )
    if with_last_layer:
        last_idx = 2 + len(scales) * per_scale
        entries.append(
            MapEntry(
                f"{seq_name}.{last_idx}.conv", ("conv_post", "conv"), "conv", bias, wn
            )
        )
    return entries


def _hifigan_entries(
    arch: HiFiGANConfig, flax_prefix: FlaxPath = ()
) -> List[MapEntry]:
    wn = True
    bias = arch.bias
    entries = [MapEntry("conv_pre", flax_prefix + ("conv_pre",), "conv", bias, wn)]
    nk = len(arch.resblock_kernel_sizes)
    for i in range(len(arch.upsample_rates)):
        if arch.transposedconv:
            entries.append(
                MapEntry(f"ups.{i}", flax_prefix + (f"up_{i}",), "convT", bias, wn)
            )
        else:
            entries.append(
                MapEntry(
                    f"ups.{i}.conv", flax_prefix + (f"up_{i}", "conv"), "conv", bias, wn
                )
            )
    for i in range(len(arch.upsample_rates)):
        for j in range(nk):
            r = i * nk + j
            rb = flax_prefix + (f"resblock_{i}_{j}",)
            if arch.resblock_type == "1":
                ndil = len(arch.resblock_dilation_sizes[j])
                for m in range(ndil):
                    entries.append(
                        MapEntry(
                            f"resblocks.{r}.convs1.{m}", rb + (f"conv1_{m}",),
                            "conv", bias, wn,
                        )
                    )
                for m in range(ndil):
                    entries.append(
                        MapEntry(
                            f"resblocks.{r}.convs2.{m}", rb + (f"conv2_{m}",),
                            "conv", bias, wn,
                        )
                    )
            else:
                for m in range(len(arch.resblock_dilation_sizes[j])):
                    entries.append(
                        MapEntry(
                            f"resblocks.{r}.convs.{m}", rb + (f"conv_{m}",),
                            "conv", bias, wn,
                        )
                    )
    entries.append(MapEntry("conv_post", flax_prefix + ("conv_post",), "conv", bias, wn))
    return entries


def generator_key_map(cfg: ModelConfig) -> List[MapEntry]:
    arch = cfg.arch
    if cfg.model_name == "melgan":
        assert isinstance(arch, MelGANConfig)
        return _melgan_trunk_entries(
            "melgan", arch.channels, arch.upsample_scales, arch.stacks,
            arch.use_causal_conv, arch.bias, arch.use_weight_norm,
        )
    if cfg.model_name == "basis-melgan":
        assert isinstance(arch, BasisMelGANConfig)
        entries = _melgan_trunk_entries(
            "melgan", arch.channels, arch.upsample_scales, arch.stacks,
            arch.use_causal_conv, arch.bias, arch.use_weight_norm,
            transposedconv=arch.transposedconv, with_last_layer=False,
        )
        entries.append(
            MapEntry(
                "basis_signal.layer", ("basis_signal",), "basis",
                bias=False, weight_norm=False,
            )
        )
        return entries
    if cfg.model_name == "hifigan":
        return _hifigan_entries(arch)
    if cfg.model_name == "multiband-hifigan":
        return _hifigan_entries(arch, flax_prefix=("trunk",))
    raise ValueError(cfg.model_name)


def _msd_scale_entries(
    torch_prefix: str, flax_prefix: FlaxPath, n_down: int = 4
) -> List[MapEntry]:
    # reference msd.py:54-100: layers.0 = Seq(pad, conv, act); layers.1-4 =
    # Seq(conv, act) downsamples; layers.5 = Seq(conv, act); layers.6 = conv
    entries = [
        MapEntry(f"{torch_prefix}.layers.0.1", flax_prefix + ("conv_first",), "conv")
    ]
    for i in range(n_down):
        entries.append(
            MapEntry(
                f"{torch_prefix}.layers.{1 + i}.0",
                flax_prefix + (f"conv_down_{i}",), "conv",
            )
        )
    entries.append(
        MapEntry(
            f"{torch_prefix}.layers.{1 + n_down}.0",
            flax_prefix + ("conv_head",), "conv",
        )
    )
    entries.append(
        MapEntry(
            f"{torch_prefix}.layers.{2 + n_down}", flax_prefix + ("conv_out",), "conv"
        )
    )
    return entries


def _mfd_scale_entries(
    torch_prefix: str, flax_prefix: FlaxPath, n_down: int = 2
) -> List[MapEntry]:
    # reference mfd.py:77-123: layers.0 = Seq(pad, conv, act); layers.1-2 =
    # downsamples; layers.3 = Seq(conv, act); layers.4 = conv
    entries = [
        MapEntry(f"{torch_prefix}.layers.0.1", flax_prefix + ("conv_first",), "conv")
    ]
    for i in range(n_down):
        entries.append(
            MapEntry(
                f"{torch_prefix}.layers.{1 + i}.0",
                flax_prefix + (f"conv_down_{i}",), "conv",
            )
        )
    entries.append(
        MapEntry(
            f"{torch_prefix}.layers.{1 + n_down}.0",
            flax_prefix + ("conv_head",), "conv",
        )
    )
    entries.append(
        MapEntry(
            f"{torch_prefix}.layers.{2 + n_down}", flax_prefix + ("conv_out",), "conv"
        )
    )
    return entries


def discriminator_key_map(
    use_mpd: bool = False, disc_cfg: Optional["DiscriminatorConfig"] = None
) -> List[MapEntry]:
    from fastvocoder_tpu.hparams import DISC

    cfg = disc_cfg if disc_cfg is not None else DISC
    use_mpd = use_mpd or cfg.use_mpd
    entries: List[MapEntry] = []
    for s in range(cfg.msd_scales):
        entries += _msd_scale_entries(
            f"msd.discriminators.{s}", ("msd", f"disc_{s}"),
            n_down=len(cfg.msd_downsample_scales),
        )
    for i in range(len(cfg.mfd_fft_sizes)):
        entries += _mfd_scale_entries(
            f"mfd.stft_discriminator.{i}", ("mfd", f"disc_{i}"),
            n_down=len(cfg.mfd_downsample_scales),
        )
    if use_mpd:
        for i in range(len(cfg.mpd_periods)):
            p = f"mpd.discriminators.{i}"
            f = ("mpd", f"disc_{i}")
            # strided stack + the stride-1 head = len(channels)+1 convs
            for c in range(len(cfg.mpd_channels) + 1):
                entries.append(
                    MapEntry(f"{p}.convs.{c}", f + (f"conv_{c}",), "conv2d")
                )
            entries.append(MapEntry(f"{p}.conv_post", f + ("conv_post",), "conv2d"))
    return entries


# ---------------------------------------------------------------------------
# Conversion
# ---------------------------------------------------------------------------


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _set_path(tree: dict, path: FlaxPath, leaf_name: str, value: np.ndarray):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def _get_path(tree: dict, path: FlaxPath) -> dict:
    node = tree
    for p in path:
        node = node[p]
    return node


def torch_to_flax(state_dict: Dict[str, Any], key_map: List[MapEntry]) -> dict:
    """torch state_dict -> flax param tree (numpy leaves)."""
    params: dict = {}
    for e in key_map:
        if e.kind == "basis":
            w = _to_np(state_dict[f"{e.torch_prefix}.weight"])  # (L, C)
            _set_path(params, e.flax_path, "basis", np.ascontiguousarray(w))
            continue
        if e.weight_norm:
            v = _to_np(state_dict[f"{e.torch_prefix}.weight_v"])
            g = _to_np(state_dict[f"{e.torch_prefix}.weight_g"])
        else:
            v = _to_np(state_dict[f"{e.torch_prefix}.weight"])
            g = None
        if e.kind == "conv":
            k = np.ascontiguousarray(np.transpose(v, (2, 1, 0)))  # (K, Ci, Co)
            gname = "g"
        elif e.kind == "convT":
            k = np.ascontiguousarray(np.transpose(v, (2, 0, 1)))  # (K, Ci, Co)
            gname = "gt"
        elif e.kind == "conv2d":
            k = np.ascontiguousarray(np.transpose(v, (2, 3, 1, 0)))  # (Kh,Kw,Ci,Co)
            gname = "g"
        else:
            raise ValueError(e.kind)
        _set_path(params, e.flax_path, "kernel", k)
        if g is not None:
            _set_path(params, e.flax_path, gname, g.reshape(-1))
        if e.bias:
            b = _to_np(state_dict[f"{e.torch_prefix}.bias"])
            _set_path(params, e.flax_path, "bias", b)
    return params


def flax_to_torch(params: dict, key_map: List[MapEntry]) -> Dict[str, np.ndarray]:
    """flax param tree -> flat torch-layout state dict (numpy values)."""
    out: Dict[str, np.ndarray] = {}
    for e in key_map:
        node = _get_path(params, e.flax_path)
        if e.kind == "basis":
            out[f"{e.torch_prefix}.weight"] = np.asarray(node["basis"])
            continue
        k = np.asarray(node["kernel"])
        if e.kind == "conv":
            v = np.transpose(k, (2, 1, 0))
            g = node.get("g")
            gshape = (-1, 1, 1)
        elif e.kind == "convT":
            v = np.transpose(k, (1, 2, 0))
            g = node.get("gt")
            gshape = (-1, 1, 1)
        elif e.kind == "conv2d":
            v = np.transpose(k, (3, 2, 0, 1))
            g = node.get("g")
            gshape = (-1, 1, 1, 1)
        else:
            raise ValueError(e.kind)
        if e.weight_norm and g is not None:
            out[f"{e.torch_prefix}.weight_v"] = np.ascontiguousarray(v)
            out[f"{e.torch_prefix}.weight_g"] = np.asarray(g).reshape(gshape)
        else:
            out[f"{e.torch_prefix}.weight"] = np.ascontiguousarray(v)
        if e.bias:
            out[f"{e.torch_prefix}.bias"] = np.asarray(node["bias"])
    return out


def discriminator_buffers() -> Dict[str, np.ndarray]:
    """The torch discriminator registers hann windows as buffers
    (reference mfd.py:68); emit them so saved dicts load strictly in torch."""
    from fastvocoder_tpu.dsp.stft import hann_window

    return {
        f"mfd.stft_discriminator.{i}.window": np.asarray(hann_window(w))
        for i, w in enumerate((1200, 600, 240))
    }


# ---------------------------------------------------------------------------
# Weight-norm fusion (the reference's remove_weight_norm)
# ---------------------------------------------------------------------------


def fuse_weight_norm(params):
    """Replace (kernel, g|gt) pairs with the normalized kernel, in any tree."""

    def fuse(node):
        if not isinstance(node, dict):
            return node
        if "kernel" in node and ("g" in node or "gt" in node):
            k = np.asarray(node["kernel"])
            out = {kk: fuse(vv) for kk, vv in node.items() if kk not in ("kernel", "g", "gt")}
            if "g" in node:  # norm over all axes but the last (Cout)
                axes = tuple(range(k.ndim - 1))
                g = np.asarray(node["g"])
                norm = np.sqrt(np.sum(k**2, axis=axes, keepdims=True))
                out["kernel"] = k * (g / norm)
            else:  # transpose conv: per-Cin (axis 1 of (K, Ci, Co))
                g = np.asarray(node["gt"])
                norm = np.sqrt(np.sum(k**2, axis=(0, 2), keepdims=True))
                out["kernel"] = k * (g[None, :, None] / norm)
            return out
        return {kk: fuse(vv) for kk, vv in node.items()}

    return fuse(params)


# ---------------------------------------------------------------------------
# Checkpoint file IO (torch.load-compatible, reference dict layout)
# ---------------------------------------------------------------------------
#
# The reference saves {'model', 'optimizer', 'discriminator',
# 'discriminator_optimizer'} (bin/train.py:235-247) and publishes
# {'model', 'pattern'} (bin/publish.py:71-74).  We write the same top-level
# keys with torch.save: 'model'/'discriminator' hold the reference key layout
# exactly (loadable by the torch reference via load_state_dict), while the
# optimizer entries hold the native optax state trees (a torch Adam state
# cannot represent optax's pytree; the reference's own restore tolerates
# missing/any optimizer content via its bare try/except, bin/train.py:359-373).


def _torch():
    import torch

    return torch


class AsyncCheckpointWriter:
    """Background-thread checkpoint saving.

    `save_checkpoint` fetches every array to the host and pickles it, which
    blocks the train loop for seconds per save on a real TPU run; here the
    loop only enqueues.  `submit` snapshots every device array with an
    asynchronous on-device copy first: the train step is compiled with
    donated state (`parallel/mesh.py` donate_argnums), so the ORIGINAL
    buffers are deleted by the next step — a worker thread reading them
    races ("Array has been deleted", found by a real 300-step TPU driver
    run).  The copies are enqueued on the device stream before the next
    step and are never donated, so the worker's host fetch is safe.  One
    worker, saves execute in submission order; call `wait()` before reading
    the files or exiting."""

    def __init__(self):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue()
        self._errors: list = []
        self._t = threading.Thread(target=self._worker, daemon=True)
        self._t.start()

    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            args, kwargs = item
            try:
                save_checkpoint(*args, **kwargs)
            except Exception as e:  # surfaced by wait()
                self._errors.append(e)
            finally:
                self._q.task_done()

    def submit(self, *args, **kwargs) -> None:
        import jax
        import jax.numpy as jnp

        snap = lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x
        args = jax.tree_util.tree_map(snap, args)
        kwargs = jax.tree_util.tree_map(snap, kwargs)
        self._q.put((args, kwargs))

    def wait(self) -> None:
        """Block until all submitted saves hit disk; re-raise any failure."""
        self._q.join()
        if self._errors:
            raise self._errors[0]


def _flatten_native(tree, prefix="") -> Dict[str, np.ndarray]:
    """Flax param tree -> {'a/b/c': array} (models with no torch-reference
    layout, e.g. NHV — the reference never implemented it)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_native(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_native(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return tree


def _has_torch_layout(cfg) -> bool:
    return cfg.model_name != "nhv"


def save_checkpoint(
    path: str,
    cfg,
    gen_params,
    disc_params=None,
    gen_opt_state=None,
    disc_opt_state=None,
    step: int = 0,
    extra: Optional[dict] = None,
    disc_cfg=None,
):
    import jax

    torch = _torch()
    host = lambda tree: jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
    if _has_torch_layout(cfg):
        model_entry = {
            k: torch.from_numpy(np.array(v))
            for k, v in flax_to_torch(host(gen_params), generator_key_map(cfg)).items()
        }
    else:  # native flat layout (no reference state_dict exists to mirror)
        model_entry = {
            k: torch.from_numpy(np.array(v))
            for k, v in _flatten_native(host(gen_params)).items()
        }
    out: dict = {
        "model": model_entry,
        "step": int(step),
    }
    if disc_params is not None:
        d = {
            k: torch.from_numpy(np.array(v))
            for k, v in flax_to_torch(
                host(disc_params), discriminator_key_map(disc_cfg=disc_cfg)
            ).items()
        }
        for k, v in discriminator_buffers().items():
            d[k] = torch.from_numpy(np.array(v))
        out["discriminator"] = d
    if gen_opt_state is not None:
        out["optimizer"] = host(gen_opt_state)
    if disc_opt_state is not None:
        out["discriminator_optimizer"] = host(disc_opt_state)
    if extra:
        out.update(extra)
    torch.save(out, path)


def load_checkpoint(
    path: str, cfg, with_discriminator: bool = True, disc_cfg=None
) -> dict:
    """Load a framework or reference torch checkpoint into flax param trees.

    Returns {'gen_params', 'disc_params'?, 'optimizer'?,
    'discriminator_optimizer'?, 'step', 'pattern'?}.
    """
    torch = _torch()
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if _has_torch_layout(cfg):
        gen_params = torch_to_flax(ckpt["model"], generator_key_map(cfg))
    else:
        gen_params = _unflatten_native(
            {k: _to_np(v) for k, v in ckpt["model"].items()}
        )
    out: dict = {
        "gen_params": gen_params,
        "step": int(ckpt.get("step", 0)),
    }
    if with_discriminator and "discriminator" in ckpt:
        out["disc_params"] = torch_to_flax(
            ckpt["discriminator"], discriminator_key_map(disc_cfg=disc_cfg)
        )
    for k in ("optimizer", "discriminator_optimizer", "pattern"):
        if k in ckpt:
            out[k] = ckpt[k]
    return out


def save_published(path: str, cfg, gen_params, pattern: np.ndarray):
    """Published artifact: {'model', 'pattern'} (reference bin/publish.py:71-74)."""
    import jax

    torch = _torch()
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(gen_params))
    torch.save(
        {
            "model": {
                k: torch.from_numpy(np.array(v))
                for k, v in flax_to_torch(host, generator_key_map(cfg)).items()
            },
            "pattern": np.asarray(pattern),
        },
        path,
    )
