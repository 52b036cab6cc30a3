"""Generate FOREIGN media fixtures: bytes produced by encoders that share
no code with this repo's from-spec builders.

The from-spec decoders in ``functions/multimodal.py`` otherwise only
ever see bytes their own builders wrote — a closed loop that can hide
complementary bugs (VERDICT r6 "Next round" #7). This container has no
network and no PIL/ffmpeg, but it does have a whole independent codec
suite: the JVM. ``javax.imageio`` (PNG/GIF/JPEG/TIFF writers) and
``javax.sound.sampled`` (WAV) are mature third-party encoders for our
purposes — byte streams they emit exercise real-world encoding choices
(PNG filter selection, GIF palette layout + LZW code emission, JPEG
quant/huffman tables and 4:2:0 layout, RIFF chunk layout) that the
repo's builders never produce.

Writes tests/fixtures/foreign/*.{png,gif,jpg,wav,tif} plus
expected.json with ground-truth stats computed from the source pixel
pattern (lossless formats must decode EXACTLY; JPEG pins dimensions and
a mean tolerance).

    python tools/make_foreign_fixtures.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_query_engine_spark import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "foreign")

W, H = 24, 16
# 8-color palette for the GIF leg (exact palette colors only -> lossless)
PALETTE = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255),
           (255, 255, 0), (0, 255, 255), (255, 0, 255), (255, 255, 255)]


def rgb_at(x: int, y: int) -> tuple[int, int, int]:
    return ((x * 7 + y * 3) % 256, (x * 5 + y * 11) % 256, (x * 13 + y * 17) % 256)


def gray_at(x: int, y: int) -> int:
    return (x * 9 + y * 5) % 256


def pal_at(x: int, y: int) -> int:
    return (x + y * 3) % len(PALETTE)


def pcm_at(i: int) -> int:
    return ((i * 773) % 20001) - 10000  # deterministic 16-bit samples


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("foreign-fixtures")
    jvm = spark._jvm
    ImageIO = jvm.javax.imageio.ImageIO
    BufferedImage = jvm.java.awt.image.BufferedImage

    def encode(img, fmt: str) -> bytes:
        baos = jvm.java.io.ByteArrayOutputStream()
        ok = ImageIO.write(img, fmt, baos)
        assert ok, fmt
        return bytes(baos.toByteArray())

    def set_pixels(img, f):
        for y in range(H):
            for x in range(W):
                r, g, b = f(x, y)
                img.setRGB(x, y, (r << 16) | (g << 8) | b)

    def set_gray_raster(img, f):
        # raw raster samples: setRGB on TYPE_BYTE_GRAY would convert
        # sRGB -> linear gray and darken every stored value
        raster = img.getRaster()
        for y in range(H):
            for x in range(W):
                raster.setSample(x, y, 0, f(x, y))

    expected: dict = {"w": W, "h": H}

    # PNG truecolor — Java's writer picks its own scanline filters
    img = BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    set_pixels(img, rgb_at)
    open(os.path.join(OUT, "rgb.png"), "wb").write(encode(img, "png"))
    sums = [0, 0, 0]
    for y in range(H):
        for x in range(W):
            for c, v in enumerate(rgb_at(x, y)):
                sums[c] += v
    expected["png_rgb_sums"] = sums

    # PNG grayscale (color type 0)
    img = BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY)
    set_gray_raster(img, gray_at)
    open(os.path.join(OUT, "gray.png"), "wb").write(encode(img, "png"))
    expected["png_gray_sum"] = sum(
        gray_at(x, y) for y in range(H) for x in range(W)
    )

    # GIF — exact palette colors only, so the quantizer is a no-op and
    # the LZW round trip must be lossless
    img = BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    set_pixels(img, lambda x, y: PALETTE[pal_at(x, y)])
    open(os.path.join(OUT, "pal.gif"), "wb").write(encode(img, "gif"))
    sums = [0, 0, 0]
    for y in range(H):
        for x in range(W):
            for c, v in enumerate(PALETTE[pal_at(x, y)]):
                sums[c] += v
    expected["gif_sums"] = sums

    # JPEG grayscale (baseline, 1 component) and RGB (Java defaults to
    # 4:2:0 YCbCr) — lossy, so expected carries the source sums and the
    # test asserts dimensions + mean tolerance
    img = BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY)
    set_gray_raster(img, gray_at)
    open(os.path.join(OUT, "gray.jpg"), "wb").write(encode(img, "jpg"))
    expected["jpeg_gray_source_sum"] = expected["png_gray_sum"]

    img = BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    set_pixels(img, rgb_at)
    open(os.path.join(OUT, "rgb.jpg"), "wb").write(encode(img, "jpg"))
    expected["jpeg_rgb_source_sums"] = expected["png_rgb_sums"]

    # TIFF (metadata walk only)
    img = BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    set_pixels(img, rgb_at)
    open(os.path.join(OUT, "rgb.tif"), "wb").write(encode(img, "tif"))

    # WAV 16-bit mono 8 kHz via javax.sound — RIFF layout from a second
    # independent writer
    n = 256
    pcm = bytearray()
    total = abs_total = 0
    for i in range(n):
        v = pcm_at(i)
        total += v
        abs_total += abs(v)
        pcm += int(v).to_bytes(2, "little", signed=True)
    AudioFormat = jvm.javax.sound.sampled.AudioFormat
    AudioInputStream = jvm.javax.sound.sampled.AudioInputStream
    AudioSystem = jvm.javax.sound.sampled.AudioSystem
    fmt = AudioFormat(8000.0, 16, 1, True, False)  # signed, little-endian
    bais = jvm.java.io.ByteArrayInputStream(bytes(pcm))
    stream = AudioInputStream(bais, fmt, n)
    baos = jvm.java.io.ByteArrayOutputStream()
    Type = jvm.javax.sound.sampled.AudioFileFormat.Type
    AudioSystem.write(stream, Type.WAVE, baos)
    open(os.path.join(OUT, "mono16.wav"), "wb").write(bytes(baos.toByteArray()))
    expected["wav"] = {"rate": 8000, "channels": 1, "bits": 16,
                       "n_samples": n, "total": total, "abs_total": abs_total}

    json.dump(expected, open(os.path.join(OUT, "expected.json"), "w"),
              indent=1)
    for f in sorted(os.listdir(OUT)):
        print(f, os.path.getsize(os.path.join(OUT, f)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
