"""Execute every python code block in docs/howtos/*.md (doc tests).

Mirrors tests/test_tutorials.py; keeps the task-oriented how-to guides
(reference counterparts: /root/reference/docs/userguide/how_to_*.rst)
executable.
"""
import pathlib
import re

import pytest

DOCS = sorted((pathlib.Path(__file__).parent.parent / "docs" / "howtos").glob("*.md"))


def _code_blocks(path):
    text = path.read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


@pytest.mark.parametrize("doc", DOCS, ids=[d.stem for d in DOCS])
def test_howto_runs(doc):
    blocks = _code_blocks(doc)
    assert blocks, f"no python blocks in {doc}"
    namespace: dict = {}
    for block in blocks:
        exec(compile(block, str(doc), "exec"), namespace)  # noqa: S102
