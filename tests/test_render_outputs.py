"""Phase-F output writer: file naming, depth companions, and the reference's
skip-if-exists resume behavior (/root/reference/rendering.py:267-270)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tgtc.models.nerf import NerfConfig, make_nerf
from tgtc.models.style_field import (
    StyleFieldConfig, init_latents, make_style_mlps,
)
from tgtc.train.render_style import (
    make_stylized_render_fn,
    render_stylized_views,
)


def _setup():
    key = jax.random.PRNGKey(0)
    nerf_cfg = NerfConfig(depth=2, width=16, embed_freq_coor=2,
                          embed_freq_dir=1, compute_dtype=jnp.float32)
    cm, npc = make_nerf(nerf_cfg, key)
    fm, npf = make_nerf(nerf_cfg, jax.random.fold_in(key, 1))
    field = StyleFieldConfig(style_d=4, width=16, latent_dim=8,
                             embed_dim=nerf_cfg.input_ch)
    cmod, pc, smod, ps = make_style_mlps(field, jax.random.fold_in(key, 2))
    lat = init_latents(jax.random.fold_in(key, 3), 2, 3, 8)
    render_fn = make_stylized_render_fn(
        cm, fm, cmod, smod, 4, 4, 0.0, 1.0, llff_tile=False,
    )
    h, w = 6, 8
    ro = jax.random.uniform(key, (3, h, w, 3)) - 0.5
    rd = jax.random.normal(key, (3, h, w, 3))
    return render_fn, npc, npf, {"concat": pc, "style": ps}, lat, ro, rd


def test_outputs_and_resume(tmp_path):
    render_fn, npc, npf, sp, lat, ro, rd = _setup()
    out = str(tmp_path / "renders")
    key = jax.random.PRNGKey(9)
    render_stylized_views(render_fn, npc, npf, sp, lat, ro, rd, [0, 1],
                          out, key, block=16)
    files = sorted(os.listdir(out))
    # 2 styles x 3 views x (rgb + depth)
    assert len(files) == 12
    assert "style_00000_fine_00000.png" in files
    assert "style_00001_fine_depth_00002.png" in files

    # resume: touch mtimes, re-run, files must not be rewritten
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in files}
    render_stylized_views(render_fn, npc, npf, sp, lat, ro, rd, [0, 1],
                          out, key, block=16)
    for f in files:
        if "depth" in f:
            continue
        assert os.path.getmtime(os.path.join(out, f)) == mtimes[f], f


def test_write_video(tmp_path):
    from PIL import Image

    from tgtc.utils.video import write_video

    d = str(tmp_path / "r")
    import os

    os.makedirs(d)
    for i in range(4):
        img = np.full((8, 8, 3), i * 60, np.uint8)
        Image.fromarray(img).save(
            os.path.join(d, f"style_00000_fine_{i:05d}.png")
        )
    out = write_video(d, fps=10)
    assert out.endswith(".gif") and os.path.getsize(out) > 0
    gif = Image.open(out)
    assert getattr(gif, "n_frames", 1) == 4


def test_streaming_gif_writer(tmp_path):
    """Frames streamed during the render produce the same artifact shape
    as the post-hoc writer, in playback order."""
    from PIL import Image

    from tgtc.utils.video import StreamingGifWriter

    out = str(tmp_path / "video.gif")
    w = StreamingGifWriter(out, fps=10)
    levels = [0, 85, 170, 255]
    for v in levels:
        w.add(np.full((8, 8, 3), v, np.uint8))
    assert w.close() == out
    gif = Image.open(out)
    assert getattr(gif, "n_frames", 1) == 4
    for i, v in enumerate(levels):  # order preserved
        gif.seek(i)
        assert abs(int(np.asarray(gif.convert("RGB"))[0, 0, 0]) - v) <= 2


def test_streaming_gif_writer_abort(tmp_path):
    from tgtc.utils.video import StreamingGifWriter

    out = str(tmp_path / "video.gif")
    w = StreamingGifWriter(out)
    w.add(np.zeros((4, 4, 3), np.uint8))
    w.abort()
    assert not os.path.exists(out)
