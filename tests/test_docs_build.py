"""Static docs builder (reference `kedro build-docs` parity)."""
from pathlib import Path

from deepcv_tpu.docs_build import build_docs, md_to_html


def test_md_to_html_covers_repo_markdown():
    h = md_to_html(
        "# Title\n\npara **bold** `code` [link](other.md)\n\n"
        "- item1\n- item2\n\n1. first\n2. second\n\n"
        "| h1 | h2 |\n|----|----|\n| a | b |\n\n"
        "> quoted\n\n---\n\n```py\nif x < 1: &\n```\n")
    assert "<h1>Title</h1>" in h
    assert "<strong>bold</strong>" in h and "<code>code</code>" in h
    assert 'href="other.html"' in h                  # .md links rewritten
    assert "<li>item1</li>" in h and "<ol>" in h
    assert "<table>" in h and "<th>h1</th>" in h and "<td>b</td>" in h
    assert "<blockquote>" in h and "<hr>" in h
    assert "<pre><code>if x &lt; 1: &amp;" in h     # code is escaped verbatim


def test_build_docs_renders_repo(tmp_path):
    repo = Path(__file__).resolve().parent.parent
    written = build_docs(out_dir=str(tmp_path), root=str(repo))
    names = {p.name for p in written}
    assert "index.html" in names and "design.html" in names
    idx = (tmp_path / "index.html").read_text()
    assert "design.html" in idx
    page = (tmp_path / "design.html").read_text()
    assert "<h1>" in page and "<nav>" in page


def test_build_docs_empty_dir_raises(tmp_path):
    import pytest
    with pytest.raises(FileNotFoundError):
        build_docs(src_dirs=("nope",), extra_files=(), out_dir=str(tmp_path),
                   root=str(tmp_path))
