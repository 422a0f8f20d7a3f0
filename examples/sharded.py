"""Multi-chip example: pixel-sharded training + sharded quantize.

Demonstrates the `kmeans_tpu.parallel` layer over a jax.sharding.Mesh —
runs identically on a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/sharded.py img.png 8
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/gfx/tokyo.png"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from kmeans_tpu.ops.colorspace import srgb8_to_lab
    from kmeans_tpu.models.kmeans import reference_seed_index
    from kmeans_tpu.parallel import fit_sharded, make_mesh, quantize_image_sharded
    from kmeans_tpu.utils.imageio import load_image, save_image
    from kmeans_tpu.image import Image

    devices = jax.devices()
    mesh = make_mesh(devices, data=1)
    print(f"mesh: 1x{len(devices)} ({devices[0].platform})")

    image = load_image(src)
    w, h = image.dimensions
    lab = srgb8_to_lab(jnp.asarray(image.pixels[..., :3]).reshape(-1, 3))

    # Pad the pixel axis to the shard count and weight out the padding.
    n = lab.shape[0]
    d = len(devices)
    n_pad = (n + d - 1) // d * d
    lab_p = jnp.pad(lab, ((0, n_pad - n), (0, 0)))
    weight = jnp.concatenate(
        [jnp.ones(n, jnp.float32), jnp.zeros(n_pad - n, jnp.float32)]
    )

    centroids, iters = fit_sharded(
        mesh, lab_p, weight, k, reference_seed_index(w, h)
    )
    print(f"converged in {int(iters)} iterations")

    out = np.asarray(
        quantize_image_sharded(mesh, image.pixels, centroids, mode="replace")
    )
    dst = os.path.basename(src).replace(".png", f"-sharded-c{k}.png")
    save_image(Image((w, h), out), dst)
    print(f"wrote {dst}: {len(np.unique(out.reshape(-1, 4), axis=0))} colors")

    # Batched DP x SP (round 4): several frames train their own palettes
    # in ONE executable — frames over the mesh's data axis, pixels over
    # its pixel axis — through the high-level entry point.
    if len(devices) >= 4 and len(devices) % 2 == 0:
        from kmeans_tpu.api import ImageProcessor, ReduceMode

        dpsp = make_mesh(devices, data=2)
        frames = [image, Image((w, h), image.pixels[::-1].copy())]
        outs = ImageProcessor().reduce_images_sharded(
            frames, k, ReduceMode.REPLACE, mesh=dpsp
        )
        print(
            f"reduce_images_sharded: {len(outs)} frames on a 2x"
            f"{len(devices) // 2} mesh, "
            f"{len(np.unique(outs[0].pixels.reshape(-1, 4), axis=0))} colors"
        )


if __name__ == "__main__":
    main()
