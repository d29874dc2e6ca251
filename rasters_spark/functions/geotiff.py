"""Pure-python GeoTIFF writer/reader — Raster.to_geotiff without rasterio.

The reference's ``Raster.to_geotiff/to_file`` delegate to rasterio
(raster.py to_file family); rasterio is absent here, so the writer
emits the format directly from the public specs (TIFF 6.0 baseline +
OGC GeoTIFF 1.1): little-endian, single-band float32, one strip,
uncompressed, with ModelPixelScaleTag (33550), ModelTiepointTag
(33922), GeoKeyDirectoryTag (34735) and GDAL's NODATA ascii tag
(42113, "nan"). The reader parses exactly this subset back — enough
for a bit-exact round-trip contract (`geotiff_roundtrip` query) and
for interchange with GDAL-based consumers.

Layout is fully deterministic: header 8 B, one IFD with 15 entries
(186 B), pixel-scale (24 B) + tiepoint (48 B) + geokeys (32 B), then
``4·w·h`` pixel bytes ⇒ total = 298 + 4·w·h, which the DuckDB oracle
recomputes in SQL.
"""

from __future__ import annotations

import struct

import numpy as np

_II = b"II*\x00"
HEADER_BYTES = 298  # 8 + (2 + 15*12 + 4) + 24 + 48 + 32

# TIFF field types
_SHORT, _LONG, _DOUBLE, _ASCII = 3, 4, 12, 2


def encode_geotiff(arr: np.ndarray, x_origin: float, y_origin: float,
                   cell_width: float, cell_height: float, epsg: int = 4326) -> bytes:
    """float32 (h, w) + north-up grid → GeoTIFF bytes."""
    a = np.ascontiguousarray(arr, dtype="<f4")
    h, w = a.shape
    ifd_off = 8
    n_entries = 15
    after_ifd = ifd_off + 2 + n_entries * 12 + 4
    scale_off = after_ifd
    tie_off = scale_off + 24
    keys_off = tie_off + 48
    data_off = keys_off + 32
    assert data_off == HEADER_BYTES

    def entry(tag, typ, count, value):
        return struct.pack("<HHI", tag, typ, count) + value

    def inline_long(v):
        return struct.pack("<I", v)

    def inline_short(v):
        return struct.pack("<HH", v, 0)

    entries = [
        entry(256, _LONG, 1, inline_long(w)),              # ImageWidth
        entry(257, _LONG, 1, inline_long(h)),              # ImageLength
        entry(258, _SHORT, 1, inline_short(32)),           # BitsPerSample
        entry(259, _SHORT, 1, inline_short(1)),            # Compression: none
        entry(262, _SHORT, 1, inline_short(1)),            # Photometric: BlackIsZero
        entry(273, _LONG, 1, inline_long(data_off)),       # StripOffsets
        entry(277, _SHORT, 1, inline_short(1)),            # SamplesPerPixel
        entry(278, _LONG, 1, inline_long(h)),              # RowsPerStrip
        entry(279, _LONG, 1, inline_long(4 * w * h)),      # StripByteCounts
        entry(284, _SHORT, 1, inline_short(1)),            # PlanarConfig
        entry(339, _SHORT, 1, inline_short(3)),            # SampleFormat: IEEE float
        entry(33550, _DOUBLE, 3, inline_long(scale_off)),  # ModelPixelScale
        entry(33922, _DOUBLE, 6, inline_long(tie_off)),    # ModelTiepoint
        entry(34735, _SHORT, 16, inline_long(keys_off)),   # GeoKeyDirectory
        entry(42113, _ASCII, 4, b"nan\x00"),               # GDAL nodata
    ]
    ifd = struct.pack("<H", n_entries) + b"".join(entries) + struct.pack("<I", 0)
    scale = struct.pack("<3d", float(cell_width), float(abs(cell_height)), 0.0)
    tie = struct.pack("<6d", 0.0, 0.0, 0.0, float(x_origin), float(y_origin), 0.0)
    geographic = epsg == 4326 or (4000 <= epsg < 5000)
    if geographic:
        keys = [(1024, 0, 1, 2), (1025, 0, 1, 1), (2048, 0, 1, epsg)]
    else:
        keys = [(1024, 0, 1, 1), (1025, 0, 1, 1), (3072, 0, 1, epsg)]
    kd = [(1, 1, 0, len(keys))] + keys
    keybytes = b"".join(struct.pack("<4H", *k) for k in kd)
    return _II + struct.pack("<I", ifd_off) + ifd + scale + tie + keybytes + a.tobytes(order="C")


def decode_geotiff(data: bytes):
    """GeoTIFF bytes (this module's subset) → (float32 (h, w) array,
    dict(x_origin, y_origin, cell_width, cell_height, epsg))."""
    if data[:4] != _II:
        raise ValueError("not a little-endian TIFF")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from("<HHI", data, ifd_off + 2 + i * 12)
        (val,) = struct.unpack_from("<I", data, ifd_off + 2 + i * 12 + 8)
        tags[tag] = (typ, count, val)
    w = tags[256][2]
    h = tags[257][2]
    if tags.get(259, (0, 0, 1))[2] != 1:
        raise ValueError("compressed TIFF not supported by this reader")
    off = tags[273][2]
    nbytes = tags[279][2]
    arr = np.frombuffer(data, dtype="<f4", count=nbytes // 4, offset=off).reshape(h, w).copy()
    sx, sy, _ = struct.unpack_from("<3d", data, tags[33550][2])
    tie = struct.unpack_from("<6d", data, tags[33922][2])
    ko = tags[34735][2]
    nkeys = struct.unpack_from("<4H", data, ko)[3]
    epsg = None
    for k in range(nkeys):
        kid, _, _, kval = struct.unpack_from("<4H", data, ko + 8 * (k + 1))
        if kid in (2048, 3072):
            epsg = kval
    return arr, {
        "x_origin": tie[3], "y_origin": tie[4],
        "cell_width": sx, "cell_height": -sy, "epsg": epsg,
    }


def tiles_to_geotiff(tiles):
    """DataFrame stage: tile rows → (image_id, tiff binary, n_bytes).
    One Arrow pass per batch; the blob never shuffles."""
    from collections.abc import Iterator

    import pandas as pd

    from rasters_spark import codec

    schema = "image_id string, tiff binary, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode_tile(r.bytes, int(r.w), int(r.h), r.fmt)
                t = encode_geotiff(arr, r.x_origin, r.y_origin, r.cell_width, r.cell_height)
                rows.append({"image_id": r.image_id, "tiff": t, "n_bytes": len(t)})
            yield pd.DataFrame(rows)

    cols = ["image_id", "bytes", "w", "h", "fmt",
            "x_origin", "y_origin", "cell_width", "cell_height"]
    return tiles.select(*cols).mapInPandas(run, schema=schema)


def save_geotiffs(tiles, out_dir: str) -> None:
    """Raster.to_file sink: one .tif per tile under ``out_dir``,
    written executor-side per partition (no driver collect)."""
    import os

    def write_part(rows):
        os.makedirs(out_dir, exist_ok=True)
        for r in rows:
            with open(os.path.join(out_dir, f"{r.image_id}.tif"), "wb") as fh:
                fh.write(r.tiff)

    tiles_to_geotiff(tiles).foreachPartition(write_part)
