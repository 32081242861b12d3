"""PDF 1.5+ structure: cross-reference streams and ObjStm-packed
objects (the dominant layout of modern web PDFs — none of the
reference's fixtures use it, so it gets its own synthetic fixture).

Parser contract (sources/pdfparse.py): object discovery is a regex
sweep + ObjStm expansion, so classic xref tables are never required and
an xref-STREAM trailer (/Type /XRef dict carrying Root) must resolve."""

import zlib

from pdf_extract_spark.operators.extract import extract_pdf
from pdf_extract_spark.sources.pdfparse import PDFDocument


def _modern_pdf() -> bytes:
    """Catalog/Pages/Page/Font packed into one Flate ObjStm; content
    stream Flate-compressed; trailer via an xref stream (no classic
    xref table, no `trailer` keyword)."""
    packed_objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Count 1 /Kids [ 3 0 R ] >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Resources << /Font "
            b"<< /F1 4 0 R >> >> /MediaBox [0 0 612 792] /Contents 5 0 R >>"),
        (4, b"<< /Type /Font /Subtype /Type1 /Name /F1 /BaseFont /Helvetica >>"),
    ]
    bodies = [b for _, b in packed_objs]
    offs = []
    pos = 0
    for b in bodies:
        offs.append(pos)
        pos += len(b) + 1
    header = " ".join(f"{n} {o}" for (n, _), o in zip(packed_objs, offs)).encode()
    payload = header + b"\n" + b"\n".join(bodies) + b"\n"
    objstm_data = zlib.compress(payload)

    content = b"BT /F1 12 Tf 72 700 Td (Modern layout works) Tj ET"
    content_z = zlib.compress(content)

    buf = bytearray(b"%PDF-1.5\n")

    def add_obj(num: int, body: bytes) -> None:
        buf.extend(f"{num} 0 obj\n".encode() + body + b"\nendobj\n")

    add_obj(6, b"<< /Type /ObjStm /N " + str(len(packed_objs)).encode()
            + b" /First " + str(len(header) + 1).encode()
            + b" /Filter /FlateDecode /Length " + str(len(objstm_data)).encode()
            + b" >>\nstream\n" + objstm_data + b"\nendstream")
    add_obj(5, b"<< /Filter /FlateDecode /Length "
            + str(len(content_z)).encode() + b" >>\nstream\n"
            + content_z + b"\nendstream")

    # xref stream: minimal, 1-byte type / 2-byte field2 / 1-byte field3
    xref_pos = len(buf)
    rows = b""
    rows += bytes([1]) + (0).to_bytes(2, "big") + bytes([0])  # free-ish stub
    xr = zlib.compress(rows)
    add_obj(7, b"<< /Type /XRef /Size 8 /Root 1 0 R /W [1 2 1] /Index [0 1]"
            b" /Filter /FlateDecode /Length " + str(len(xr)).encode()
            + b" >>\nstream\n" + xr + b"\nendstream")
    buf.extend(f"startxref\n{xref_pos}\n%%EOF\n".encode())
    return bytes(buf)


def test_objstm_and_xref_stream_parse():
    doc = PDFDocument(_modern_pdf())
    assert "Root" in doc.trailer
    pages = doc.pages()
    assert len(pages) == 1
    assert b"Modern layout works" in pages[0].content


def test_modern_pdf_extracts():
    res = extract_pdf(_modern_pdf())
    assert res.error is None
    assert [t for k, t, _, _ in res.spans if k == "text"] == [
        "Modern layout works"
    ]


def test_type0_ucs2_cmap_without_tounicode():
    """Type0 font with a predefined Uni*-UCS2 /Encoding and NO ToUnicode
    stream: 2-byte codes decode as UCS-2 codepoints (CJK fidelity —
    poppler resolves this via Adobe's CMap files; the UCS2 family needs
    no table)."""
    from pdf_extract_spark.operators.extract import extract_pdf

    text = "中文测试"
    hexstr = "".join(f"{ord(c):04X}" for c in text)
    stream = f"BT /F1 12 Tf 72 700 Td <{hexstr}> Tj ET".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Count 1 /Kids [ 3 0 R ] >>",
        b"<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >>"
        b" /MediaBox [0 0 612 792] /Contents 4 0 R >>",
        b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
        + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light"
        b" /Encoding /UniGB-UCS2-H /DescendantFonts [ 6 0 R ] >>",
        b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /STSong-Light"
        b" /DW 1000 /CIDSystemInfo << /Registry (Adobe) /Ordering (GB1)"
        b" /Supplement 2 >> >>",
    ]
    buf = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref}\n%%EOF\n").encode()

    res = extract_pdf(bytes(buf))
    assert res.error is None
    texts = [t for k, t, _, _ in res.spans if k == "text"]
    assert texts == [text], texts
