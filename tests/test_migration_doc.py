"""Execute every python code block in docs/migration.md (doc test).

The migration guide claims symbol-by-symbol parity with the reference;
running its blocks keeps those claims verified.
"""
import pathlib
import re

DOC = pathlib.Path(__file__).parent.parent / "docs" / "migration.md"


def test_migration_doc_runs():
    blocks = re.findall(r"```python\n(.*?)```", DOC.read_text(), flags=re.DOTALL)
    assert blocks, "no python blocks in docs/migration.md"
    namespace: dict = {}
    for block in blocks:
        exec(compile(block, str(DOC), "exec"), namespace)  # noqa: S102
