"""
Image manifests and storage (reference surface: lhotse/image/;
reference tests: test/test_image.py) plus video gating behavior.
"""
import numpy as np
import pytest

from lhotse_tpu.image.image import Image
from lhotse_tpu.image.io import PillowInMemoryWriter, PillowWriter
from lhotse_tpu.testing.dummies import dummy_cut

pytest.importorskip("PIL")


@pytest.fixture
def rgb():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)


def test_pillow_file_roundtrip(tmp_path, rgb):
    with PillowWriter(str(tmp_path)) as w:
        img = w.store_image("pic1", rgb)
    assert isinstance(img, Image)
    assert (img.height, img.width) == (48, 64) and img.shape == (48, 64)
    out = img.load()
    assert out.shape == rgb.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out, rgb)  # PNG: lossless


def test_pillow_memory_roundtrip(rgb):
    img = PillowInMemoryWriter().store_image("k", rgb)
    assert img.is_in_memory
    np.testing.assert_array_equal(img.load(), rgb)


def test_image_serialization_roundtrip(tmp_path, rgb):
    with PillowWriter(str(tmp_path)) as w:
        img = w.store_image("pic1", rgb)
    img2 = Image.from_dict(img.to_dict())
    assert img2 == img
    np.testing.assert_array_equal(img2.load(), rgb)


def test_move_to_memory_detaches(tmp_path, rgb):
    with PillowWriter(str(tmp_path)) as w:
        img = w.store_image("pic1", rgb)
    mem = img.move_to_memory()
    assert mem.is_in_memory
    np.testing.assert_array_equal(mem.load(), rgb)


def test_load_as_pil_image(rgb):
    from PIL import Image as PILImage

    img = Image.from_pillow(PILImage.fromarray(rgb))
    pil = img.load(as_pil_image=True)
    assert isinstance(pil, PILImage.Image)
    assert pil.size == (64, 48)


def test_attach_image_to_cut_and_reload(tmp_path, rgb):
    from PIL import Image as PILImage

    path = tmp_path / "frame.png"
    PILImage.fromarray(rgb).save(path)
    cut = dummy_cut(0).attach_image("thumbnail", str(path))
    assert cut.has_custom("thumbnail")
    np.testing.assert_array_equal(cut.load_thumbnail(), rgb)
    # Survives manifest serialization.
    reloaded = type(cut).from_dict(cut.to_dict())
    np.testing.assert_array_equal(reloaded.load_thumbnail(), rgb)


def test_video_loading_is_cleanly_gated(tmp_path):
    """Without a video decoder in the env, has_video is False and
    load_video raises an informative error instead of crashing."""
    from lhotse_tpu.testing.dummies import dummy_recording

    rec = dummy_recording(0, with_data=True)
    assert not rec.has_video
    with pytest.raises(AssertionError, match="video"):
        rec.load_video()


def test_collate_images_batches_uniform_shapes(tmp_path, rgb):
    from lhotse_tpu import CutSet
    from lhotse_tpu.dataset.collation import collate_images

    cuts = []
    with PillowWriter(str(tmp_path)) as w:
        for i in range(3):
            c = dummy_cut(i)
            c.image = w.store_image(f"img{i}", rgb)
            cuts.append(c)
    batch = collate_images(CutSet.from_cuts(cuts), image_field="image")
    assert batch.shape == (3, 48, 64, 3)
    np.testing.assert_array_equal(batch[0], rgb)


def test_collate_custom_field_with_image(tmp_path, rgb):
    from lhotse_tpu import CutSet
    from lhotse_tpu.dataset.collation import collate_custom_field

    cuts = []
    with PillowWriter(str(tmp_path)) as w:
        for i in range(2):
            c = dummy_cut(i)
            c.thumbnail = w.store_image(f"t{i}", rgb)
            cuts.append(c)
    batch = collate_custom_field(CutSet.from_cuts(cuts), "thumbnail")
    assert np.asarray(batch).shape == (2, 48, 64, 3)


def test_image_plot_smoke(rgb):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    with PillowInMemoryWriter() as w:
        img = w.store_image("p", rgb)
    ax = img.plot()
    assert ax is not None
