"""
Flagship compute path: a pure-JAX Transformer speech encoder trained with
masked feature prediction (BEST-RQ-style self-supervision, simplified to
masked log-mel reconstruction) on top of the GEMM fbank frontend.

TPU-first design notes:
- All matmuls are einsums over static shapes → MXU-tiled by XLA.
- Parameters are plain pytrees; multi-chip sharding is expressed purely via
  ``jax.sharding.NamedSharding`` annotations (see :func:`param_shardings`):
  attention heads and FFN hidden dim shard over the "model" axis, batch over
  "data" — XLA inserts the psum/all-gather collectives.
- bfloat16 activations with float32 params/optimizer state (standard mixed
  precision); the loss is computed in float32.
"""
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class EncoderConfig:
    num_mel_bins: int = 80
    d_model: int = 256
    num_heads: int = 8
    num_layers: int = 4
    ffn_dim: int = 1024
    max_len: int = 4096
    mask_prob: float = 0.3
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.num_heads == 0
        return self.d_model // self.num_heads


def _sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    pos = np.arange(max_len)[:, None].astype(np.float64)
    dim = np.arange(d_model // 2)[None, :].astype(np.float64)
    angle = pos / np.power(10000.0, 2 * dim / d_model)
    out = np.zeros((max_len, d_model), dtype=np.float32)
    out[:, 0::2] = np.sin(angle)
    out[:, 1::2] = np.cos(angle)
    return out


def init_params(key: jax.Array, cfg: EncoderConfig) -> Params:
    """Initialize the encoder parameter pytree (float32)."""
    n = cfg.num_layers
    keys = jax.random.split(key, 4 + 6 * n)
    k_it = iter(keys)

    def dense(key, shape, fan_in):
        return jax.random.normal(key, shape, jnp.float32) / np.sqrt(fan_in)

    params: Params = {
        "input_proj": dense(next(k_it), (cfg.num_mel_bins, cfg.d_model), cfg.num_mel_bins),
        "mask_embed": jax.random.normal(next(k_it), (cfg.num_mel_bins,), jnp.float32) * 0.1,
        "output_proj": dense(next(k_it), (cfg.d_model, cfg.num_mel_bins), cfg.d_model),
        "final_ln": {"scale": jnp.ones(cfg.d_model), "bias": jnp.zeros(cfg.d_model)}, "layers": []}
    for _ in range(n):
        layer = {
            "ln1": {"scale": jnp.ones(cfg.d_model), "bias": jnp.zeros(cfg.d_model)},
            "wqkv": dense( next(k_it), (cfg.d_model, 3, cfg.num_heads, cfg.head_dim), cfg.d_model, ),
            "wo": dense( next(k_it), (cfg.num_heads, cfg.head_dim, cfg.d_model), cfg.d_model ),
            "ln2": {"scale": jnp.ones(cfg.d_model), "bias": jnp.zeros(cfg.d_model)},
            "w1": dense(next(k_it), (cfg.d_model, cfg.ffn_dim), cfg.d_model),
            "b1": jnp.zeros(cfg.ffn_dim),
            "w2": dense(next(k_it), (cfg.ffn_dim, cfg.d_model), cfg.ffn_dim),
            "b2": jnp.zeros(cfg.d_model)}
        params["layers"].append(layer)
    return params


def _layer_norm(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _block(x: jnp.ndarray, layer: Params, pad_mask: jnp.ndarray, cfg: EncoderConfig):
    # Self-attention.
    h = _layer_norm(x, layer["ln1"])
    qkv = jnp.einsum("btd,dchk->cbthk", h, layer["wqkv"].astype(cfg.dtype))
    q, k, v = qkv[0], qkv[1], qkv[2]
    scores = jnp.einsum("bthk,bshk->bhts", q, k) / np.sqrt(cfg.head_dim)
    scores = jnp.where(pad_mask[:, None, None, :], scores, -1e9)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cfg.dtype)
    ctx = jnp.einsum("bhts,bshk->bthk", probs, v)
    attn_out = jnp.einsum("bthk,hkd->btd", ctx, layer["wo"].astype(cfg.dtype))
    x = x + attn_out
    # FFN.
    h = _layer_norm(x, layer["ln2"])
    h = jnp.einsum("btd,df->btf", h, layer["w1"].astype(cfg.dtype)) + layer["b1"].astype(cfg.dtype)
    h = jax.nn.gelu(h)
    h = jnp.einsum("btf,fd->btd", h, layer["w2"].astype(cfg.dtype)) + layer["b2"].astype(cfg.dtype)
    return x + h


def forward(
    params: Params, feats: jnp.ndarray, feat_lens: Optional[jnp.ndarray] = None,
    cfg: EncoderConfig = EncoderConfig()) -> jnp.ndarray:
    """
    Encode a feature batch: (B, T, F) → (B, T, D) hidden states.
    Padding positions (>= feat_lens) are masked out of attention.
    """
    b, t, f = feats.shape
    if feat_lens is None:
        pad_mask = jnp.ones((b, t), dtype=bool)
    else:
        pad_mask = jnp.arange(t)[None, :] < feat_lens[:, None]

    x = jnp.einsum("btf,fd->btd", feats.astype(cfg.dtype), params["input_proj"].astype(cfg.dtype))
    pos = jnp.asarray(_sinusoidal_positions(cfg.max_len, cfg.d_model))[:t]
    x = x + pos.astype(cfg.dtype)[None]

    for layer in params["layers"]:
        x = _block(x, layer, pad_mask, cfg)

    return _layer_norm(x, params["final_ln"])


def masked_prediction_loss(
    params: Params, feats: jnp.ndarray, feat_lens: jnp.ndarray, mask_key: jax.Array,
    cfg: EncoderConfig = EncoderConfig()) -> jnp.ndarray:
    """
    Masked feature prediction: replace a random subset of frames with a
    learned mask embedding, encode, and regress the original log-mels at the
    masked positions (float32 MSE).
    """
    b, t, f = feats.shape
    valid = jnp.arange(t)[None, :] < feat_lens[:, None]
    mask = jax.random.bernoulli(mask_key, cfg.mask_prob, (b, t)) & valid

    masked_inputs = jnp.where(mask[..., None], params["mask_embed"][None, None, :], feats)
    hidden = forward(params, masked_inputs, feat_lens, cfg)
    pred = jnp.einsum(
        "btd,df->btf", hidden, params["output_proj"].astype(cfg.dtype)).astype(jnp.float32)

    err = jnp.square(pred - feats.astype(jnp.float32)).mean(-1)
    denom = jnp.maximum(mask.sum(), 1)
    return (err * mask).sum() / denom


def sgd_train_step(
    params: Params, feats: jnp.ndarray, feat_lens: jnp.ndarray, mask_key: jax.Array,
    cfg: EncoderConfig = EncoderConfig(), lr: float = 1e-3) -> Tuple[Params, jnp.ndarray]:
    """One SGD step of the masked-prediction objective (optimizer-free
    variant used for sharding dry-runs and smoke tests)."""
    loss, grads = jax.value_and_grad(masked_prediction_loss)(
        params, feats, feat_lens, mask_key, cfg)
    params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    return params, loss


def make_adamw_train_step(cfg: EncoderConfig, lr: float = 1e-3):
    """AdamW training step factory (optax)."""
    import optax

    tx = optax.adamw(lr)

    def init(params):
        return tx.init(params)

    def step(params, opt_state, feats, feat_lens, mask_key):
        loss, grads = jax.value_and_grad(masked_prediction_loss)(
            params, feats, feat_lens, mask_key, cfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init, step


def param_shardings(params: Params, mesh) -> Params:
    """
    NamedShardings for tensor-parallel placement over a mesh with axes
    ("data", "model"): attention heads and the FFN hidden dim shard over
    "model"; everything else is replicated. Activations shard batch over
    "data" via the input sharding.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def repl():
        return NamedSharding(mesh, P())

    def spec(*axes):
        return NamedSharding(mesh, P(*axes))

    out = {
        "input_proj": repl(), "mask_embed": repl(), "output_proj": repl(),
        "final_ln": {"scale": repl(), "bias": repl()}, "layers": []}
    for _ in params["layers"]:
        out["layers"].append(
            {
                "ln1": {"scale": repl(), "bias": repl()},
                "wqkv": spec(None, None, "model", None),  # shard heads
                "wo": spec("model", None, None),
                "ln2": {"scale": repl(), "bias": repl()},
                "w1": spec(None, "model"),  # shard ffn hidden
                "b1": spec("model"),
                "w2": spec("model", None),
                "b2": repl(),
            }
        )
    return out
