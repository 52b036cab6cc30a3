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

    # ---- round-8 corpus extension (r7 verdict #7: more encoders/depths)

    def encode_with_param(img, fmt: str, progressive: bool = False,
                          quality: float | None = None) -> bytes:
        """Encode through an explicit ImageWriter so write params
        (progressive scan scripts, quant quality) are exercised — byte
        layouts ImageIO.write's defaults never produce."""
        writer = ImageIO.getImageWritersByFormatName(fmt).next()
        param = writer.getDefaultWriteParam()
        ImageWriteParam = jvm.javax.imageio.ImageWriteParam
        if progressive:
            param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
        if quality is not None:
            param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
            param.setCompressionQuality(float(quality))
        baos = jvm.java.io.ByteArrayOutputStream()
        mos = jvm.javax.imageio.stream.MemoryCacheImageOutputStream(baos)
        writer.setOutput(mos)
        IIOImage = jvm.javax.imageio.IIOImage
        writer.write(None, IIOImage(img, None, None), param)
        mos.flush()
        writer.dispose()
        return bytes(baos.toByteArray())

    # progressive JPEG, grayscale — the decoder family behind the r6
    # regression, now pinned against a second encoder's scan script
    img = BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY)
    set_gray_raster(img, gray_at)
    open(os.path.join(OUT, "prog_gray.jpg"), "wb").write(
        encode_with_param(img, "jpg", progressive=True)
    )

    # progressive JPEG, color (Java emits 4:2:0 YCbCr)
    img = BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    set_pixels(img, rgb_at)
    open(os.path.join(OUT, "prog_rgb.jpg"), "wb").write(
        encode_with_param(img, "jpg", progressive=True)
    )

    # low-quality baseline JPEG — coarse quant tables, heavy coefficient
    # truncation; dimensions must survive even when values drift
    img = BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY)
    set_gray_raster(img, gray_at)
    open(os.path.join(OUT, "q30_gray.jpg"), "wb").write(
        encode_with_param(img, "jpg", quality=0.3)
    )

    # grayscale TIFF — photometric 1 (BlackIsZero), single-sample tags
    img = BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY)
    set_gray_raster(img, gray_at)
    open(os.path.join(OUT, "gray.tif"), "wb").write(encode(img, "tif"))

    # PackBits TIFFs (r11): the JDK TIFF plugin's own RLE encoder — a
    # foreign twin for the from-spec PackBits codec; exact pixel decode
    def encode_tiff_packbits(img) -> bytes:
        it = ImageIO.getImageWritersByFormatName("tif")
        writer = it.next()
        param = writer.getDefaultWriteParam()
        param.setCompressionMode(
            jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT
        )
        param.setCompressionType("PackBits")
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
        ios.flush()
        writer.dispose()
        return bytes(baos.toByteArray())

    img = BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    set_pixels(img, rgb_at)
    open(os.path.join(OUT, "rgb_packbits.tif"), "wb").write(
        encode_tiff_packbits(img)
    )
    img = BufferedImage(W, H, BufferedImage.TYPE_BYTE_GRAY)
    set_gray_raster(img, gray_at)
    open(os.path.join(OUT, "gray_packbits.tif"), "wb").write(
        encode_tiff_packbits(img)
    )

    # WAV 16-bit STEREO — interleaved L/R frames from javax.sound
    nf = 200
    pcm2 = bytearray()
    sl = srr = 0
    peak = 0
    for i in range(nf):
        lv = pcm_at(2 * i)
        rv = pcm_at(2 * i + 1)
        sl += lv
        srr += rv
        peak = max(peak, abs(lv), abs(rv))
        pcm2 += int(lv).to_bytes(2, "little", signed=True)
        pcm2 += int(rv).to_bytes(2, "little", signed=True)
    fmt2 = AudioFormat(8000.0, 16, 2, True, False)
    bais2 = jvm.java.io.ByteArrayInputStream(bytes(pcm2))
    stream2 = AudioInputStream(bais2, fmt2, nf)
    baos2 = jvm.java.io.ByteArrayOutputStream()
    AudioSystem.write(stream2, Type.WAVE, baos2)
    open(os.path.join(OUT, "stereo16.wav"), "wb").write(
        bytes(baos2.toByteArray())
    )
    expected["wav_stereo"] = {"rate": 8000, "n_frames": nf, "sum_left": sl,
                              "sum_right": srr, "peak": peak}

    # ---- round-9 corpus extension (r8 verdict #6: 16-bit PNG, CMYK /
    # Adobe-transform JPEG — variants whose PIXEL decode is a documented
    # reject-to-NULL boundary but whose metadata walk and sniffing must
    # still work, and whose truncation mutants must never crash)

    # 16-bit grayscale PNG (depth 16, color type 0) — raster samples so
    # no sRGB conversion touches the stored values
    img16 = BufferedImage(W, H, BufferedImage.TYPE_USHORT_GRAY)
    raster16 = img16.getRaster()
    for y in range(H):
        for x in range(W):
            raster16.setSample(x, y, 0, (x * 2500 + y * 700) % 65536)
    open(os.path.join(OUT, "gray16.png"), "wb").write(encode(img16, "png"))
    vals16 = [(x * 2500 + y * 700) % 65536 for y in range(H) for x in range(W)]
    expected["png16"] = {"depth": 16, "channels": 1, "sum": sum(vals16),
                         "min": min(vals16), "max": max(vals16)}

    # ---- round-10 corpus extension (r9 verdict #7): the SAME 16-bit
    # image through javax's PROGRESSIVE png mode — Adam7 interlacing at
    # depth 16, the one PNG layout axis the foreign set did not yet
    # cross with 16-bit samples; decode stats must equal gray16.png's
    png_writer = ImageIO.getImageWritersByFormatName("png").next()
    prog_param = png_writer.getDefaultWriteParam()
    prog_param.setProgressiveMode(
        jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT
    )
    baos16i = jvm.java.io.ByteArrayOutputStream()
    mos16i = jvm.javax.imageio.stream.MemoryCacheImageOutputStream(baos16i)
    png_writer.setOutput(mos16i)
    png_writer.write(
        None, jvm.javax.imageio.IIOImage(img16, None, None), prog_param
    )
    mos16i.flush()
    png_writer.dispose()
    g16i = bytes(baos16i.toByteArray())
    assert g16i[28] == 1, "javax progressive png did not set interlace=1"
    open(os.path.join(OUT, "gray16i.png"), "wb").write(g16i)
    expected["png16i"] = expected["png16"]

    # 4-component baseline JPEG: javax's writer refuses ARGB
    # BufferedImages but happily encodes a raw 4-band interleaved
    # Raster — SOF0 with Nf=4 and NO Adobe APP14 (decoders conventionally
    # read that as CMYK). The repo's pixel decoders reject Nf∉{1,3} by
    # documented boundary; metadata must still report 4 components.
    Raster = jvm.java.awt.image.Raster
    Point = jvm.java.awt.Point
    DataBuffer = jvm.java.awt.image.DataBuffer
    raster4 = Raster.createInterleavedRaster(
        DataBuffer.TYPE_BYTE, W, H, 4, Point(0, 0)
    )
    for y in range(H):
        for x in range(W):
            for band in range(4):
                raster4.setSample(x, y, band, (x * (band + 3) + y * (band + 7)) % 256)
    writer = ImageIO.getImageWritersByFormatName("jpg").next()
    baos4 = jvm.java.io.ByteArrayOutputStream()
    mos4 = jvm.javax.imageio.stream.MemoryCacheImageOutputStream(baos4)
    writer.setOutput(mos4)
    IIOImage = jvm.javax.imageio.IIOImage
    writer.write(None, IIOImage(raster4, None, None), None)
    mos4.flush()
    writer.dispose()
    cmyk = bytes(baos4.toByteArray())
    open(os.path.join(OUT, "cmyk4.jpg"), "wb").write(cmyk)

    # Adobe-transform variant: the same stream with an APP14 "Adobe"
    # segment (transform=2, YCCK) spliced after SOI — the marker layout
    # Photoshop-exported CMYK JPEGs carry in real crawls
    app14 = (
        b"\xff\xee" + (14).to_bytes(2, "big") + b"Adobe"
        + b"\x00\x64" + b"\x00\x00" + b"\x00\x00" + b"\x02"
    )
    open(os.path.join(OUT, "adobe_ycck.jpg"), "wb").write(
        cmyk[:2] + app14 + cmyk[2:]
    )
    band_sums = [
        sum((x * (band + 3) + y * (band + 7)) % 256
            for y in range(H) for x in range(W))
        for band in range(4)
    ]
    expected["jpeg4"] = {"n_comp": 4, "precision": 8,
                         "source_band_sums": band_sums}

    json.dump(expected, open(os.path.join(OUT, "expected.json"), "w"),
              indent=1)
    for f in sorted(os.listdir(OUT)):
        print(f, os.path.getsize(os.path.join(OUT, f)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
