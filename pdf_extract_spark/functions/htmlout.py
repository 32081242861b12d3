"""S7 HTML sink: render extracted documents to the reference's
alignment-optimized HTML (README.md:234-298; emission loop
PDFExtract.java:1265-1433).

Deterministic string formatting over the processed line list — used for
golden-format parity and as the optional HTML output column; the primary
sink remains the spans table (span-sequence equality surface).

Format reproduced:
  <html>\n<head>\n <defaultLang abbr="…"/>\n <languages><language
  abbr percent rows/>…</languages>\n</head>\n<body>\n <div id="pageN"
  class="page">\n  <p id="pageNpM" lang="…" fontname="…">\n   line…\n
  </p>…  — paragraph counters reset per page (`page2p1`), paragraph lang
  and fontname taken from the paragraph's first line
  (PDFExtract.java:1399-1404).
"""

from __future__ import annotations

from html import escape


def render_document(
    lines,
    lang: str = "",
    lang_dist=None,
    warnings=None,
    keep_br: bool = False,
    permission: dict | None = None,
) -> str:
    """lines: ordered layout.Line objects (pageno, para, lang, family,
    text). Returns the full HTML document string."""
    out: list[str] = ["<html>", "<head>"]
    if lang:
        out.append(f'    <defaultLang abbr="{escape(lang, quote=True)}" />')
    if lang_dist:
        out.append("    <languages>")
        for item in lang_dist:
            l, pct, rows = item[0], item[1], item[2]
            out.append(
                f'        <language abbr="{escape(str(l), quote=True)}" '
                f'percent="{pct}" rows="{rows}" />'
            )
        out.append("    </languages>")
    if warnings:
        out.append("    <warnings>")
        for w in warnings:
            m, d, s = w[0], w[1], w[2]
            out.append(
                f'        <warning method="{escape(str(m), quote=True)}" '
                f'detail="{escape(str(d), quote=True)}" '
                f'suggestion="{escape(str(s), quote=True)}" />'
            )
        out.append("    </warnings>")
    if permission is not None:
        # S6 block (emitted with -P 1 in the reference,
        # PDFExtract.java:1352-1364; Java booleans print lowercase)
        def b(key: str) -> str:
            return "true" if permission.get(key) else "false"

        out.append(f'<permission isencrypted="{b("is_encrypted")}">')
        out.append(f'<canassemply>{b("can_assembly")}</canassemply>')
        out.append(f'<cancopy>{b("can_copy")}</cancopy>')
        out.append(f'<canmodified>{b("can_modified")}</canmodified>')
        out.append(
            f'<canmodifyannotations>{b("can_modify_annotations")}'
            "</canmodifyannotations>"
        )
        out.append(f'<canprint>{b("can_print")}</canprint>')
        out.append(f'<canprintdegraded>{b("can_print_degraded")}</canprintdegraded>')
        out.append(f'<canfillinform>{b("can_fill_in_form")}</canfillinform>')
        out.append(f'<canscreenreader>{b("can_screen_reader")}</canscreenreader>')
        out.append("</permission>")
    out.append("</head>")
    out.append("<body>")

    cur_page = None
    cur_para = None
    page_para_n = 0
    open_p = False

    def close_p():
        nonlocal open_p
        if open_p:
            out.append("        </p>")
            open_p = False

    def close_page():
        nonlocal cur_page
        if cur_page is not None:
            close_p()
            out.append("    </div>")
            cur_page = None

    sep = "<br />" if keep_br else ""
    for ln in lines:
        if ln.pageno != cur_page:
            close_page()
            cur_page = ln.pageno
            cur_para = None
            page_para_n = 0
            out.append(f'    <div id="page{ln.pageno}" class="page">')
        if ln.para != cur_para:
            close_p()
            cur_para = ln.para
            page_para_n += 1
            plang = escape(ln.lang or lang, quote=True)
            pfont = escape(ln.family or "", quote=True)
            out.append(
                f'        <p id="page{ln.pageno}p{page_para_n}" '
                f'lang="{plang}" fontname="{pfont}">'
            )
            open_p = True
        out.append(f"            {escape(ln.text)}{sep}")
    close_page()
    out.append("</body>")
    out.append("</html>")
    return "\n".join(out)


def render_error(message: str) -> str:
    """S8 error sink document (Common.getOutputError, Common.java:588-607)."""
    return (
        "<html>\n<head></head>\n<body>\n"
        f"<error>{escape(message)}</error>\n</body>\n</html>"
    )
