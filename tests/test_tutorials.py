"""Execute every python code block in docs/tutorials/*.md (doc tests)."""
import pathlib
import re

import pytest

DOCS = sorted((pathlib.Path(__file__).parent.parent / "docs" / "tutorials").glob("*.md"))


def _code_blocks(path):
    text = path.read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


@pytest.mark.parametrize("doc", DOCS, ids=[d.stem for d in DOCS])
def test_tutorial_runs(doc):
    blocks = _code_blocks(doc)
    assert blocks, f"no python blocks in {doc}"
    namespace: dict = {}
    for block in blocks:
        exec(compile(block, str(doc), "exec"), namespace)  # noqa: S102
