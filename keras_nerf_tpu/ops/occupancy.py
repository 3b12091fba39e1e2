"""Occupancy-grid accelerated novel-view rendering (opt-in).

NerfAcc-style empty-space skipping (PAPERS.md), reshaped for the TPU's
dense/static-shape execution model:

* :func:`bake_occupancy_grid` evaluates the trained fine model's density on
  a dense voxel grid over the scene AABB (one fused forward, ~2 TFLOP at
  128**3) and thresholds + dilates it into a binary occupancy volume;
* :func:`occupancy_along_rays` marches D uniform probe bins per ray and
  gathers containing-voxel occupancy — a [R, D] weight field;
* :func:`sample_occupied` inverts that field with the SAME sorted
  inverse-CDF machinery the fine pass uses (`ops/sampling.py`), so all K
  MLP samples land inside occupied space (uniform over it, exact within
  half a probe bin).

Rendering then needs only K MLP evaluations per ray instead of the exact
path's n_coarse + (n_coarse + n_fine) — the coarse pass disappears
entirely. Static shapes throughout: no per-ray variable sample counts, no
compaction; empty rays degrade to a uniform spread (weights + 1e-5) and
render background.

This changes the math vs the reference (`keras_nerf/model/nerf/nerf.py:
175-216` always evaluates the dense coarse march), so it is strictly
opt-in for novel-view rendering: training and eval metrics never touch it.
Measured quality/throughput on a trained model: docs/QUALITY.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from keras_nerf_tpu.ops.sampling import midpoints, sample_pdf_sorted

# The Blender `nerf_synthetic` cameras orbit at radius ~4 looking at the
# origin with near/far 2..6: the object sits well inside [-2, 2]^3.
DEFAULT_AABB = ((-2.0, -2.0, -2.0), (2.0, 2.0, 2.0))


def grid_coordinates(grid_size: int, aabb=DEFAULT_AABB) -> jnp.ndarray:
    """Voxel-center world coordinates ``[G, G, G, 3]``."""
    lo = jnp.asarray(aabb[0], jnp.float32)
    hi = jnp.asarray(aabb[1], jnp.float32)
    axes = [
        lo[i] + (hi[i] - lo[i]) * (jnp.arange(grid_size) + 0.5) / grid_size
        for i in range(3)
    ]
    x, y, z = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([x, y, z], axis=-1)


def dilate_occupancy(occ: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Binary 6-neighbourhood max-pool dilation of ``[G, G, G]``.

    Guards against thin surfaces falling between voxel centers and against
    the half-probe-bin placement error of :func:`sample_occupied`.
    """
    for _ in range(iterations):
        shifted = [occ]
        for axis in range(3):
            shifted.append(jnp.roll(occ, 1, axis=axis).at[
                tuple(slice(0, 1) if a == axis else slice(None)
                      for a in range(3))].set(0.0))
            shifted.append(jnp.roll(occ, -1, axis=axis).at[
                tuple(slice(-1, None) if a == axis else slice(None)
                      for a in range(3))].set(0.0))
        occ = jnp.max(jnp.stack(shifted), axis=0)
    return occ


def bake_occupancy_grid(
    density_fn,
    grid_size: int = 128,
    aabb=DEFAULT_AABB,
    sigma_threshold: float = 1.0,
    dilate: int = 1,
) -> jnp.ndarray:
    """Evaluate ``density_fn([N, 3]) -> sigma [N]`` on the voxel grid and
    threshold into a binary ``[G, G, G]`` float occupancy volume.

    ``sigma_threshold`` is in raw density units: a voxel contributes alpha
    ``1 - exp(-sigma * delta)`` per unit step, so 1.0 marks anything with
    non-negligible absorption at the scene's length scale. ``dilate``
    max-pools the result to cover thin features.
    """
    coords = grid_coordinates(grid_size, aabb).reshape(-1, 3)
    sigma = density_fn(coords).reshape(grid_size, grid_size, grid_size)
    occ = (sigma > sigma_threshold).astype(jnp.float32)
    if dilate > 0:
        occ = dilate_occupancy(occ, dilate)
    return occ


@functools.lru_cache(maxsize=8)
def _density_chunk_fn(config, resolved: bool):
    """One shared jitted ``(params, positions, dirs) -> sigma`` per
    (config, path). Params MUST be runtime arguments: a closure would bake
    them into the HLO as constants, forcing a full XLA recompile on every
    re-bake of a training occupancy grid (the weights change each epoch —
    measured as multi-second per-epoch compiles plus occasional
    minutes-long plan-lottery stalls on the tunneled TPU)."""
    from keras_nerf_tpu.models.mlp import apply_mlp
    from keras_nerf_tpu.ops.encoding import encode_position_and_directions

    @jax.jit
    def one_chunk(params, p, d):
        if resolved:
            from keras_nerf_tpu.kernels import fused_point_forward
            _, sigma = fused_point_forward(
                params, p, d, config.mlp, config.pos_emb_xyz,
                config.pos_emb_dir)
            return sigma[:, 0]
        # encode at t=0 along a dummy direction: position is p itself.
        enc_xyz, enc_dir = encode_position_and_directions(
            p, d, jnp.zeros((p.shape[0], 1), p.dtype),
            config.pos_emb_xyz, config.pos_emb_dir)
        _, sigma = apply_mlp(params, enc_xyz[:, 0], enc_dir[:, 0],
                             config.mlp, config.dtype)
        return sigma[:, 0]

    return one_chunk


def model_density_fn(params, config, *, use_pallas: bool | None = None,
                     chunk: int = 262144):
    """The trained model's ``positions -> sigma`` (view direction is
    irrelevant to sigma — `keras_nerf/model/nerf/mlp.py:17-18,40`)."""
    from keras_nerf_tpu.models import engine as _engine

    resolved = _engine.resolve_use_pallas(config) if use_pallas is None \
        else use_pallas
    chunk_fn = _density_chunk_fn(config, bool(resolved))

    def one_chunk(p, d):
        return chunk_fn(params, p, d)

    def density(positions: jnp.ndarray) -> jnp.ndarray:
        # Host-side chunk loop (the bake is a one-off outside jit): a
        # device-side lax.map over the pallas forward tickles an XLA-TPU
        # priority-fusion compiler crash (SIGILL in
        # TpuPriorityFusionQueue::NormalizedComputationCost) at 2M points.
        n = positions.shape[0]
        dirs = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, -1.0], positions.dtype), positions.shape)
        if n <= chunk:
            return one_chunk(positions, dirs)
        # Pad to a chunk multiple so every call shares one compiled shape
        # (arbitrary grid sizes, not just powers of two).
        n_pad = (n + chunk - 1) // chunk * chunk
        p_pad = jnp.concatenate(
            [positions, jnp.zeros((n_pad - n, 3), positions.dtype)])
        d_pad = jnp.concatenate([dirs, dirs[:n_pad - n]]) if n_pad > n \
            else dirs
        outs = [one_chunk(p_pad[i:i + chunk], d_pad[i:i + chunk])
                for i in range(0, n_pad, chunk)]
        return jnp.concatenate(outs)[:n]

    return density


def probe_bin_mids(near: float, far: float, n_probe: int) -> jnp.ndarray:
    """Centers of the ``n_probe`` uniform probe bins on ``[near, far]`` —
    the depth coordinates :func:`occupancy_along_rays` probes at. Shared
    with the probe-row cache (`engine.train_step occ_rows`) so cached and
    live probes are bit-identical."""
    edges = jnp.linspace(near, far, n_probe + 1, dtype=jnp.float32)
    return 0.5 * (edges[1:] + edges[:-1])


@functools.partial(
    jax.jit,
    static_argnames=("image_height", "image_width", "n_probe"))
def probe_rows_for_poses(
    poses: jnp.ndarray,
    focal,
    occ_grid: jnp.ndarray,
    *,
    image_height: int,
    image_width: int,
    near: float,
    far: float,
    n_probe: int,
    aabb=DEFAULT_AABB,
) -> jnp.ndarray:
    """Probe-row cache builder: ``[N, 4, 4]`` poses -> ``[N, H*W, n_probe]``
    uint8 occupancy rows against a FIXED grid.

    Ray origins/directions are pose-deterministic (only the stratified
    depths are jittered — reference `rays.py:116-126`), and the grid is
    constant between re-bakes, so each image's probe result is a constant
    the training loop can gather instead of re-probing every step (the
    occupancy-train tier's only residual non-kernel cost,
    scripts/profile_occtrain.py). uint8 is exact for a binary grid.
    """
    from keras_nerf_tpu.data.rays import generate_rays

    def one(pose):
        o, d = generate_rays(pose, image_height, image_width, focal)
        _, occ = occupancy_along_rays(
            o.reshape(-1, 3), d.reshape(-1, 3), occ_grid, near, far,
            n_probe, aabb)
        return occ.astype(jnp.uint8)

    return jax.vmap(one)(poses)


def occupancy_along_rays(
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    occ_grid: jnp.ndarray,
    near: float,
    far: float,
    n_probe: int,
    aabb=DEFAULT_AABB,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """March ``n_probe`` uniform bins per ray, gathering containing-voxel
    occupancy at each bin center.

    Args:
      origin/direction: ``[R, 3]``.
      occ_grid: ``[G, G, G]`` binary floats from :func:`bake_occupancy_grid`.

    Returns:
      ``(bin_mids [R, n_probe], occ [R, n_probe])``; points outside the
      AABB read as empty.
    """
    g = occ_grid.shape[0]
    mids = probe_bin_mids(near, far, n_probe)                 # [D]
    pts = origin[:, None, :] + direction[:, None, :] * mids[None, :, None]

    lo = jnp.asarray(aabb[0], jnp.float32)
    hi = jnp.asarray(aabb[1], jnp.float32)
    rel = (pts - lo) / (hi - lo)                              # [R, D, 3]
    idx = jnp.floor(rel * g).astype(jnp.int32)
    inside = jnp.all((idx >= 0) & (idx < g), axis=-1)
    idx = jnp.clip(idx, 0, g - 1)
    # One flat gather instead of a 3-operand gather: measured 21% cheaper
    # on v5e (scripts/profile_probe.py — the gather is latency-bound, and
    # the flat form skips XLA's multi-axis index arithmetic).
    flat = (idx[..., 0] * g + idx[..., 1]) * g + idx[..., 2]
    occ = jnp.take(occ_grid.reshape(-1), flat)
    occ = jnp.where(inside, occ, 0.0)
    return jnp.broadcast_to(mids, occ.shape), occ


def sample_occupied(
    key: jax.Array,
    bin_mids: jnp.ndarray,
    occ: jnp.ndarray,
    n_samples: int,
) -> jnp.ndarray:
    """Draw ``n_samples`` sorted depths per ray, uniform over the occupied
    bins (inverse-CDF over the occupancy indicator; the ``weights + 1e-5``
    stabilizer makes all-empty rays degrade to a uniform spread).

    ``sample_pdf_sorted`` wants one more weight than bin coordinate (the
    reference's full-coarse-weights contract, `nerf.py:186-187`): the D
    occupancy bins play the weights role over the D-1 interior midpoints.
    """
    return sample_pdf_sorted(key, midpoints(bin_mids), occ, n_samples)


def _render_points_chunk(params, origin, direction, points, key, config,
                         packed_q=None, packed=None, sample_inputs=None):
    """Forward + quadrature over explicit per-ray depths (fused kernel on
    TPU, XLA elsewhere) -> ``RenderOutput`` (weights omitted).

    ``packed_q`` is an optional quantized FINE weights dict
    (`kernels/quantize.py: quantize_packed`) — the int8 render tier over
    explicit points (fused path only; ignored on the XLA path, matching
    `engine.render_image_batch`). ``packed`` is an optional pre-packed
    f32/bf16 weights dict (`pack_mlp_params`) so callers with a chunk
    loop pack once outside it (chunk-invariant, like
    `engine.render_image_batch`). ``sample_inputs`` (fused path only)
    replaces ``points`` with the kernel-prologue sampling form —
    ``(bin_mids, occ, u, None)`` here — so the inverse-CDF runs in-kernel.
    """
    from keras_nerf_tpu.models import engine as _engine
    from keras_nerf_tpu.ops.rendering import RenderOutput

    if _engine._use_fused_train(config, None):
        from keras_nerf_tpu.kernels import pack_mlp_params
        from keras_nerf_tpu.kernels.ray_march import fused_train_chunk

        if packed_q is not None:
            packed = packed_q
        elif packed is None:
            packed = pack_mlp_params(params, config.mlp, config.pos_emb_xyz,
                                     config.pos_emb_dir)
        if sample_inputs is not None:
            points = None
        image, depth, _ = fused_train_chunk(
            packed, origin, direction, points, None, config.mlp,
            pos_emb_xyz=config.pos_emb_xyz, pos_emb_dir=config.pos_emb_dir,
            white_background=config.white_background, with_grad=False,
            emit_weights=False, quantized=packed_q is not None,
            sample_inputs=sample_inputs)[:3]
        return RenderOutput(image=image, depth=depth, weights=None)
    out, _ = _engine.render_chunk(params, origin, direction, points, key,
                                  config)
    return out



@functools.partial(
    jax.jit, static_argnames=("config", "near", "far", "n_samples",
                              "n_probe", "ray_chunks", "aabb"))
def render_image_batch_occ(
    fine_params,
    rays,
    occ_grid: jnp.ndarray,
    key: jax.Array,
    config,
    near: float = 2.0,
    far: float = 6.0,
    n_samples: int = 64,
    n_probe: int = 64,
    ray_chunks: int = 8192,
    aabb=DEFAULT_AABB,
    packed_q=None,
) -> dict:
    """Full-image occupancy-accelerated render: ``{'image' [B, H, W, 3],
    'depth' [B, H, W]}`` using only the FINE model at ``n_samples``
    MLP evaluations per ray, all placed inside occupied space.

    ``rays`` is the standard ``(origin, direction, points)`` triple; the
    stratified ``points`` are ignored (occupancy replaces both the coarse
    march and the importance sampling). ``packed_q`` is the optional int8
    FINE weights dict (the `--quantized_render` tier composed with the
    occupancy grid; fused path only).
    """
    origin, direction = rays[0], rays[1]
    b, h, w = origin.shape[:3]
    num_rays = b * h * w
    ray_chunks = min(ray_chunks, num_rays)
    assert num_rays % ray_chunks == 0, (num_rays, ray_chunks)
    nch = num_rays // ray_chunks

    o = origin.reshape(nch, ray_chunks, 3)
    d = direction.reshape(nch, ray_chunks, 3)
    keys = jax.random.split(key, nch)

    # Packing is chunk-invariant — hoist it out of the scan (matches
    # engine.render_image_batch; the quantized dict arrives pre-baked).
    packed = None
    from keras_nerf_tpu.models import engine as _engine
    if packed_q is None and _engine._use_fused_train(config, None):
        from keras_nerf_tpu.kernels import pack_mlp_params
        packed = pack_mlp_params(fine_params, config.mlp,
                                 config.pos_emb_xyz, config.pos_emb_dir)

    from keras_nerf_tpu.ops.sampling import sorted_uniforms
    occ_fuse = (_engine._use_fused_train(config, None)
                and _engine._fused_sampling_ok(config)
                and n_probe <= 128 and n_samples <= 128)

    def body(_, x):
        oc, dc, k = x
        mids, occ = occupancy_along_rays(oc, dc, occ_grid, near, far,
                                         n_probe, aabb)
        if occ_fuse:
            # Inverse-CDF in the kernel prologue (same RNG stream as
            # sample_occupied; no merge partner).
            u = sorted_uniforms(k, (oc.shape[0],), n_samples)
            out = _render_points_chunk(
                fine_params, oc, dc, None, k, config, packed_q=packed_q,
                packed=packed, sample_inputs=(mids, occ, u, None))
        else:
            pts = sample_occupied(k, mids, occ, n_samples)
            out = _render_points_chunk(fine_params, oc, dc, pts, k, config,
                                       packed_q=packed_q, packed=packed)
        return None, (out.image, out.depth)

    _, (image, depth) = jax.lax.scan(body, None, (o, d, keys))
    return {
        "image": image.reshape(b, h, w, 3),
        "depth": depth.reshape(b, h, w),
    }
