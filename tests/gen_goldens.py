"""One-off golden-fixture generator (provenance tool, not part of the suite).

Extracts the three pure chunker functions from the reference sources by AST
(so the reference's torch/docling imports are never executed), runs them on
the fixture inputs, and writes tests/fixtures/chunker_goldens.json.

The committed JSON is *behavioral data* from the reference — the contract our
reimplementation must match byte-for-byte. Re-run only if fixture inputs
change: ``python tests/gen_goldens.py``.

Reference functions exercised:
- simple_sentence_chunker        /root/reference/src/.../late_chunking.py:73-136
- chunk_document (enhanced)      /root/reference/src/.../enhanced_chunking.py:112-174
- simple_traditional_chunking    /root/reference/src/.../embedding_evaluation.py:640-665
"""

from __future__ import annotations

import ast
import json
import textwrap
from pathlib import Path

REF = Path("/root/reference/src/docling_japanese_books")
OUT = Path(__file__).parent / "fixtures" / "chunker_goldens.json"

# the reference's embedded Japanese sample document
# (scripts/evaluate_all_chunking_strategies.py:88-115)
JP_SAMPLE = """
        コンピュータサイエンスにおける自然言語処理（しぜんげんごしょり、Natural Language Processing、NLP）は、
        人間が日常的に使っている自然言語をコンピュータに処理させる一連の技術である。
        自然言語処理は言語学、コンピュータ科学、人工知能の学際的な分野である。

        近年、深層学習の発展により、自然言語処理技術は大幅に向上した。
        特に、Transformerアーキテクチャの登場は、機械翻訳、文書要約、質問応答などの
        タスクにおいて革命的な改善をもたらした。

        日本語の自然言語処理は、特有の課題を持つ。漢字、ひらがな、カタカナという
        三つの文字体系の混在、語順の柔軟性、敬語システムの複雑さなどが挙げられる。
        これらの特徴により、日本語専用の前処理技術やモデルの開発が重要である。
        """

INPUTS = {
    "jp_sample": JP_SAMPLE,
    "ascii_only": "Hello world. This is a test! Is it? Yes. " * 5,
    "empty": "",
    "no_terminators": "just one long run of text with no sentence enders at all",
    "consecutive_terminators": "短い。。！？次の文！？！もう一つ。",
    "quote_endings": "彼は「こんにちは」。彼女は『さようなら』！そして終わり。",
    "mixed_width": "ＡＢＣ１２３。ｶﾀｶﾅ文字！全角　空白？end.",
    "long_repeat": ("これは長い文章です。" * 100),
}

MAX_LENS = [50, 400, 500, 800]


def extract_function(path: Path, name: str):
    """Pull one function out of a module source by AST, exec it standalone."""
    tree = ast.parse(path.read_text())
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and node.name == name:
            src = textwrap.dedent(ast.get_source_segment(path.read_text(), node))
            ns: dict = {}
            exec("import re\nimport numpy as np\n" + src, ns)
            fn = ns[name]
            # methods take self — bind a dummy
            return lambda *a, **k: fn(None, *a, **k)
    raise KeyError(f"{name} not found in {path}")


def main() -> None:
    c1 = extract_function(REF / "late_chunking.py", "simple_sentence_chunker")
    c2 = extract_function(REF / "enhanced_chunking.py", "chunk_document")
    c3 = extract_function(REF / "embedding_evaluation.py", "simple_traditional_chunking")

    goldens = []
    for input_name, doc in INPUTS.items():
        for max_len in MAX_LENS:
            chunks1, spans1 = c1(doc, max_len)
            chunks2, spans2 = c2(doc, max_len)
            chunks3 = c3(doc, max_len)
            goldens.append(
                {
                    "input": input_name,
                    "max_len": max_len,
                    "c1_chunks": chunks1,
                    "c1_spans": [list(s) for s in spans1],
                    "c2_chunks": chunks2,
                    "c2_spans": [list(s) for s in spans2],
                    "c3_chunks": chunks3,
                }
            )

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(
        json.dumps({"inputs": INPUTS, "goldens": goldens}, ensure_ascii=False, indent=1)
    )
    print(f"wrote {OUT} ({len(goldens)} cases)")


if __name__ == "__main__":
    main()
