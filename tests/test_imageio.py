"""Native codec stage tests: decode/encode/sniff/orient + fuzz corpus.

Covers what the reference only spec'd (SURVEY.md section 4: fuzz tests for
corrupt/polyglot images, EXIF strip property)."""

import io

import numpy as np
import pytest

from image_restoration_platform_tpu import imageio


@pytest.fixture(scope="module")
def rgb():
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)


def test_native_library_builds():
    assert imageio.native_available()


def test_jpeg_roundtrip(rgb):
    data = imageio.encode_jpeg(rgb, quality=95)
    assert imageio.sniff_format(data) == "jpeg"
    decoded = imageio.decode_image(data)
    assert decoded.format == "jpeg"
    assert decoded.pixels.shape == rgb.shape
    # q95 roundtrip should be close
    assert np.abs(decoded.pixels.astype(int) - rgb.astype(int)).mean() < 12


def test_png_roundtrip_lossless(rgb):
    data = imageio.encode_png(rgb)
    assert imageio.sniff_format(data) == "png"
    decoded = imageio.decode_image(data)
    assert np.array_equal(decoded.pixels, rgb)


def test_webp_roundtrip(rgb):
    data = imageio.encode_webp(rgb, quality=90)
    assert imageio.sniff_format(data) == "webp"
    decoded = imageio.decode_image(data)
    assert decoded.pixels.shape == rgb.shape


def test_jpeg_attaches_srgb_icc(rgb):
    data = imageio.encode_jpeg(rgb, attach_srgb_icc=True)
    assert b"ICC_PROFILE" in data
    # and the stream still decodes
    assert imageio.decode_image(data).pixels.shape == rgb.shape


def test_jpeg_strips_exif(rgb):
    # PIL writes EXIF; our encoder must not carry it through re-encode
    from PIL import Image

    buf = io.BytesIO()
    im = Image.fromarray(rgb)
    exif = im.getexif()
    exif[0x0112] = 6  # orientation
    exif[0x0131] = "secret-software-tag"
    im.save(buf, "JPEG", exif=exif.tobytes())
    decoded = imageio.decode_image(buf.getvalue())
    assert decoded.orientation == 6

    reencoded = imageio.encode_jpeg(decoded.pixels)
    assert b"Exif" not in reencoded


def test_exif_auto_orient(rgb):
    from PIL import Image

    buf = io.BytesIO()
    im = Image.fromarray(rgb)
    exif = im.getexif()
    exif[0x0112] = 6  # rotate 90 CW to display
    im.save(buf, "JPEG", quality=95, exif=exif.tobytes())

    decoded = imageio.decode_image(buf.getvalue())
    # 64x96 rotated -> 96 wide becomes 64, etc.
    assert (decoded.height, decoded.width) == (96, 64)

    unoriented = imageio.decode_image(buf.getvalue(), auto_orient=False)
    assert (unoriented.height, unoriented.width) == (64, 96)


def test_sniff_rejects_unknown():
    assert imageio.sniff_format(b"GIF89a not supported") is None
    assert imageio.sniff_format(b"\x00" * 32) is None


@pytest.mark.parametrize(
    "corrupt",
    [
        b"",
        b"\xff\xd8\xff",  # jpeg magic, no body
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 16,  # png magic, garbage body
        b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 8,
        b"\xff\xd8\xff\xe0" + bytes(range(256)) * 4,  # fuzzed jpeg-ish
    ],
)
def test_fuzz_corrupt_inputs_raise(corrupt):
    with pytest.raises(ValueError):
        imageio.decode_image(corrupt)


def test_truncated_jpeg_does_not_crash(rgb):
    data = imageio.encode_jpeg(rgb)
    truncated = data[: len(data) // 2]
    # libjpeg may error or salvage partial rows; either way: no crash, and
    # any returned pixels have the advertised shape
    try:
        decoded = imageio.decode_image(truncated)
        assert decoded.pixels.shape[2] == 3
    except ValueError:
        pass


def test_decompression_bomb_rejected(rgb):
    """A small container declaring huge dimensions must be rejected before the
    output buffer is allocated (ADVICE: header-driven multi-GB allocation)."""
    import struct
    import zlib

    png = bytes(imageio.encode_png(rgb))
    # patch IHDR width/height to 60000x60000 (3.6 GP) and fix the chunk CRC
    ihdr_start = png.index(b"IHDR")
    patched = bytearray(png)
    patched[ihdr_start + 4 : ihdr_start + 12] = struct.pack(">II", 60000, 60000)
    crc = zlib.crc32(bytes(patched[ihdr_start : ihdr_start + 17]))
    patched[ihdr_start + 17 : ihdr_start + 21] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="pixel"):
        imageio.decode_image(bytes(patched))


def test_zero_dimension_rejected():
    import struct
    import zlib

    rng = np.random.default_rng(7)
    png = bytes(imageio.encode_png(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)))
    ihdr_start = png.index(b"IHDR")
    patched = bytearray(png)
    patched[ihdr_start + 4 : ihdr_start + 12] = struct.pack(">II", 0, 8)
    crc = zlib.crc32(bytes(patched[ihdr_start : ihdr_start + 17]))
    patched[ihdr_start + 17 : ihdr_start + 21] = struct.pack(">I", crc)
    with pytest.raises(ValueError):
        imageio.decode_image(bytes(patched))


def test_property_exif_gps_strip_random_orientations():
    """Property-style EXIF/GPS-strip test the reference only spec'd
    (design.md:1276-1306): over random orientations, sizes, and metadata
    payloads, decode applies the orientation and re-encode carries no EXIF,
    GPS, or XMP bytes."""
    from PIL import Image

    rng = np.random.default_rng(1234)
    for trial in range(24):
        h = int(rng.integers(16, 96))
        w = int(rng.integers(16, 96))
        orientation = int(rng.integers(1, 9))
        pixels = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

        im = Image.fromarray(pixels)
        exif = im.getexif()
        exif[0x0112] = orientation
        exif[0x010E] = "desc-" + "".join(chr(65 + int(c)) for c in rng.integers(0, 26, 12))
        exif[0x0131] = "secret-software"
        from PIL.ExifTags import IFD

        lat = (float(rng.integers(0, 90)), float(rng.integers(0, 60)), 30.0)
        exif[IFD.GPSInfo] = {1: "N", 2: lat, 3: "W"}  # real GPS sub-IFD
        buf = io.BytesIO()
        im.save(buf, "JPEG", quality=95, exif=exif.tobytes())
        original = buf.getvalue()
        assert b"Exif" in original

        decoded = imageio.decode_image(original)
        assert decoded.orientation == orientation
        # orientations 5-8 transpose the canvas
        if orientation >= 5:
            assert (decoded.height, decoded.width) == (w, h)
        else:
            assert (decoded.height, decoded.width) == (h, w)

        reencoded = imageio.encode_jpeg(decoded.pixels, quality=85, chroma_444=True)
        assert b"Exif" not in reencoded
        assert b"secret-software" not in reencoded
        assert b"GPS" not in reencoded
        assert b"http://ns.adobe.com/xap" not in reencoded
        # re-decoding reports identity orientation and preserved canvas
        redecoded = imageio.decode_image(reencoded)
        assert redecoded.orientation == 1
        assert redecoded.pixels.shape == decoded.pixels.shape


def test_result_retention_purges_payloads():
    """Finished-job results expire per retention policy (GCS 30-day lifecycle
    analog, gcsClient.js:26-42) while metadata stays queryable."""
    from image_restoration_platform_tpu.serve.jobs import JobState, JobStore

    now = [1000.0]
    store = JobStore(result_retention_s=100.0, clock=lambda: now[0])
    job = store.create("u", {})
    store.transition(job.id, JobState.RUNNING)
    store.transition(job.id, JobState.SUCCEEDED, result={"restoredImage": "AAAA"})
    assert store.get(job.id).result is not None

    now[0] += 50
    assert store.get(job.id).result is not None  # inside retention
    now[0] += 100
    purged = store.purge_expired_results()
    assert purged == 1
    survivor = store.get(job.id)
    assert survivor is not None and survivor.result is None
    assert survivor.state is JobState.SUCCEEDED
    assert "expired" in survivor.error["message"]
