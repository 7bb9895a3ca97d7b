"""ML ingest: disk -> fused preprocessing pipeline -> JAX train step.

The framework's flagship configuration (SURVEY §7 stretch config):
media on disk is decoded/converted/resized by ONE fused XLA program and
the resulting batches feed a JAX model without ever visiting host
Python pixel code.
"""

import os
import tempfile
import time

import numpy as np


def make_dataset(path: str, frames: int = 64) -> None:
    """Write a y4m clip to ingest (stand-in for a real camera dump)."""
    from gstreamer_tpu.core.parse import parse_launch
    p = parse_launch(
        f"videotestsrc num-buffers={frames} pattern=ball ! "
        "video/x-raw,format=I420,width=640,height=360,framerate=30/1 ! "
        f"y4menc location={path}")
    p.run()


def main():
    import jax
    import jax.numpy as jnp
    from gstreamer_tpu.core.parse import parse_launch

    with tempfile.TemporaryDirectory() as d:
        clip = os.path.join(d, "train.y4m")
        make_dataset(clip)

        # the preprocessing pipeline: decode -> convert -> resize to the
        # model's input, all fused into one jitted program
        p = parse_launch(
            f"filesrc location={clip} ! videoconvertscale ! "
            "video/x-raw,format=RGB,width=224,height=224 ! "
            "appsink name=out")
        sink = p.get_by_name("out")

        # a toy model + train step
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (224 * 224 * 3, 10)) * 0.01

        @jax.jit
        def train_step(w, batch):
            x = batch.reshape(batch.shape[0], -1).astype(jnp.float32) / 255

            def loss_fn(w):
                return jnp.mean(jnp.square(x @ w))

            loss, grad = jax.value_and_grad(loss_fn)(w)
            return w - 1e-4 * grad, loss

        frames = 0
        t0 = time.perf_counter()
        p.set_state("PLAYING")
        while p.tick():
            while True:
                s = sink.pull_sample()
                if s is None:
                    break
                r, g, b = (jnp.asarray(x) for x in s.buffer.data)
                batch = jnp.stack([r, g, b], axis=-1)   # (B,224,224,3)
                w, loss = train_step(w, batch)
                frames += batch.shape[0]
        jax.block_until_ready(w)
        dt = time.perf_counter() - t0
        print(f"ingested+trained on {frames} frames in {dt:.2f}s "
              f"(incl. compilation), final loss {float(loss):.5f}")


if __name__ == "__main__":
    main()
