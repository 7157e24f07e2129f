"""Multi-host loopback worker: one process of an N-process jax.distributed
job (SURVEY.md §4.3). Run by tests/test_multihost.py, not collected by
pytest.

Each process owns 2 virtual CPU devices; the global (1, sp) mesh spans all
processes. The worker encodes its local tiles of a shared deterministic
image through the mode-1 shard_map path, gathers every tile's substream
(the DCN-analogue collective), stitches them in tile order, and writes the
result — the test asserts all processes produce identical bytes, equal to
a single-process encode.
"""
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import numpy as np
    import jax

    # the axon site hook (if present on PYTHONPATH) pins jax_platforms to
    # "axon,cpu"; config wins over the env var
    jax.config.update("jax_platforms", "cpu")

    # must run before anything that initializes the XLA backend
    from ric_tpu.parallel.multihost import init_distributed, global_mesh

    init_distributed(f"localhost:{port}", nproc, pid)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    from ric_tpu.config import CodecConfig, Transform
    from ric_tpu.parallel import tiling
    from ric_tpu.models import image_codec
    assert jax.process_count() == nproc, jax.process_count()
    mesh = global_mesh(dp=1)
    sp = mesh.shape["sp"]
    assert sp == 2 * nproc

    h, tile_w = 64, 64
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(h, sp * tile_w)).astype(np.int32) - 128

    tile_cfg = CodecConfig(
        width=tile_w, height=h, quant=0, transform=Transform.CDF53, levels=3
    )
    fn = tiling.build_tiled_encode(tile_cfg, mesh)
    sharding = NamedSharding(mesh, P("dp", None, "sp"))
    x = jax.make_array_from_callback(
        (1, h, sp * tile_w), sharding, lambda idx: img[None][idx]
    )
    wA, tA, wB, tB = fn(x)
    # DCN-analogue: gather every tile's substream words to all processes
    wA, tA, wB, tB = multihost_utils.process_allgather(
        (wA, tA, wB, tB), tiled=True)
    wA, tA, wB, tB = (np.asarray(v)[0] for v in (wA, tA, wB, tB))

    blob = b""
    for t in range(sp):
        a = image_codec.words_to_bytes(jnp.asarray(wA[t]), int(tA[t]))
        b = image_codec.words_to_bytes(jnp.asarray(wB[t]), int(tB[t]))
        blob += len(a).to_bytes(4, "little") + a
        blob += len(b).to_bytes(4, "little") + b

    with open(os.path.join(outdir, f"out_{pid}.bin"), "wb") as f:
        f.write(blob)

    # golden: single-device per-tile encode (mode-1 streams are per-tile
    # independent, so this must be byte-identical)
    if pid == 0:
        gold = b""
        for t in range(sp):
            tile = img[:, t * tile_w : (t + 1) * tile_w]
            a, b = image_codec.encode_plane_bytes(tile, tile_cfg, chroma=False)
            gold += len(a).to_bytes(4, "little") + a
            gold += len(b).to_bytes(4, "little") + b
        with open(os.path.join(outdir, "gold.bin"), "wb") as f:
            f.write(gold)


if __name__ == "__main__":
    main()
