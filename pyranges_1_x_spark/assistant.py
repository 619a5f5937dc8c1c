"""``pr.assistant`` — prime an AI coding assistant for this engine.

Reference: ``core/assistant.py:16-78`` + ``methods/export_docs.py`` — the
reference's helper is NOT an LLM client: ``prompt()`` returns a priming
string the USER pastes into their assistant, and ``export_docs()`` builds a
single text blob of the library's public docstrings to upload as context.
Both are pure local text operations, so the full surface is reproduced
here with no network dependency. (Earlier rounds excluded this module on
the mistaken belief it called a model endpoint; it does not.)

Deliberate deviations, each load-bearing:

* The prompt text primes for THIS package (PySpark-native, lazy
  DataFrames, ``pyranges_1_x_spark`` names) rather than the reference's
  pandas subclass — a prompt describing eager pandas semantics would prime
  the assistant to write code that collects 100 TB to the driver.
* ``export_docs(include_df=...)`` becomes ``include_inherited=``. There is
  no pandas base class here and nothing is literally inherited —
  ``GenomicRanges``/``RangeFrame`` are pure composition whose public
  methods are thin delegators to kernel functions in ``operators/`` etc.,
  where the real docstrings live (and are exported once, under their home
  module). The dial's composition analogue of "inherited docs": with
  ``include_inherited=True`` each class method whose own docstring is
  empty *inherits* the docstring of the same-named kernel function into
  its class entry, making the class section self-contained at the cost of
  duplicating kernel text; the default keeps each doc in one place.
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
from pathlib import Path

info = """Utilities to prime an AI coding assistant for pyranges_1_x_spark tasks.

Get a prompt to copy-paste into an AI assistant:
    >>> import pyranges_1_x_spark as pr
    >>> pr.assistant.prompt()

Build a file with the engine's documentation to upload to the assistant:
    >>> pr.assistant.export_docs("pr_spark_docs.txt")"""

_PROMPT = (
    "Act as an expert bioinformatics engineer experienced with "
    "pyranges_1_x_spark, a PySpark-native genomic interval engine whose "
    "full public documentation is attached for you to learn. Answer my "
    "coding requests by first explaining the workflow, then giving code "
    "built on the v1-style method names you find in the attached docs "
    "(join_overlaps, merge_overlaps, nearest_ranges, ...), not the v0 "
    "names you may have seen elsewhere. Frames are LAZY Spark DataFrames: "
    "chain transformations and let one action materialize the result; "
    "never collect a large frame to the driver to compute on it in pandas."
)
_PROMPT_CONCISE = (
    " Keep code as concise as possible but elegant: assume the package and "
    "a SparkSession are already set up, skip import statements, and use "
    "aptly named variables without declaring them."
)

_PKG = "pyranges_1_x_spark"


def _public_defined_in(module):
    """(name, obj) pairs for public symbols DEFINED in ``module`` — skips
    re-exports so each docstring appears once, under its home module."""
    for name, obj in sorted(vars(module).items()):
        if name.startswith("_"):
            continue
        if getattr(obj, "__module__", None) == module.__name__:
            yield name, obj


def _format_doc(header: str, obj) -> str:
    doc = inspect.getdoc(obj) or ""
    rule = "#" * 100
    return f"{rule}\n{header}\n{'#' * max(len(header), 1)}\n{doc}\n"


def _class_methods(cls):
    for name, obj in inspect.getmembers(cls):
        if name.startswith("_") or not callable(obj):
            continue
        yield name, obj


def _export_docs(*, include_inherited: bool = False) -> str:
    """One blob: package docstring, every public module's public functions/
    classes, and every public method of the two frame classes. Pure
    introspection — importable modules only, silently skipping anything
    whose import fails (mirrors the reference's tolerant walker).

    ``include_inherited=True`` additionally copies the docstring of the
    same-named kernel function into each class-method entry whose own
    docstring is empty (the composition analogue of inherited docs — see
    module docstring)."""
    parts: list[str] = []
    root = importlib.import_module(_PKG)
    parts.append(_format_doc(_PKG, root))

    # name -> (home module, doc) for every public function; the longest doc
    # wins a name collision (e.g. thin re-wrappers of the same kernel).
    kernel_docs: dict[str, tuple[str, str]] = {}

    modnames = [_PKG]
    for _, subname, _ in pkgutil.walk_packages(root.__path__, f"{_PKG}."):
        # __main__ executes the CLI at import; no dunder module carries API
        # docs worth exporting.
        if subname.rsplit(".", 1)[-1].startswith("_"):
            continue
        modnames.append(subname)
    for modname in sorted(set(modnames)):
        try:
            mod = importlib.import_module(modname)
        except Exception:  # noqa: BLE001  (optional deps, CLI glue)
            continue
        for name, obj in _public_defined_in(mod):
            if inspect.isclass(obj) or inspect.isfunction(obj):
                try:
                    sig = str(inspect.signature(obj))
                except (TypeError, ValueError):
                    sig = ""
                parts.append(_format_doc(f"{modname}.{name}{sig}", obj))
                doc = inspect.getdoc(obj) or ""
                if inspect.isfunction(obj) and len(doc) > len(
                    kernel_docs.get(name, ("", ""))[1]
                ):
                    kernel_docs[name] = (modname, doc)

    from pyranges_1_x_spark.core import GenomicRanges
    from pyranges_1_x_spark.range_frame import RangeFrame

    for cls in (GenomicRanges, RangeFrame):
        for name, obj in _class_methods(cls):
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = ""
            header = f"{cls.__name__}.{name}{sig}"
            if include_inherited and not (inspect.getdoc(obj) or "").strip():
                home, doc = kernel_docs.get(name, ("", ""))
                if doc:
                    rule = "#" * 100
                    parts.append(
                        f"{rule}\n{header}\n{'#' * len(header)}\n"
                        f"(docstring inherited from {home}.{name})\n{doc}\n"
                    )
                    continue
            parts.append(_format_doc(header, obj))
    return "\n".join(parts)


class Assistant:
    """Prompt + docs-blob builder for AI coding assistants (reference
    ``core/assistant.py`` Assistant; see module docstring for deviations)."""

    def __str__(self) -> str:
        return info

    def __repr__(self) -> str:
        return info

    def prompt(self, to_file=None, *, concise: bool = False) -> str | None:
        """The priming prompt; written to ``to_file`` if given (returns
        None then), else returned (reference assistant.prompt)."""
        msg = _PROMPT + _PROMPT_CONCISE if concise else _PROMPT
        if to_file is not None:
            Path(to_file).write_text(msg, encoding="utf-8")
            return None
        return msg

    def export_docs(self, to_file=None, *, include_inherited: bool = False) -> str | None:
        """Full public-docstring blob; written to ``to_file`` if given
        (returns None then), else returned (reference
        assistant.export_docs; ``include_inherited`` replaces the
        reference's ``include_df``: True copies each same-named kernel
        function's docstring into empty class-method entries — see
        module docstring)."""
        blob = _export_docs(include_inherited=include_inherited)
        if to_file is not None:
            Path(to_file).write_text(blob, encoding="utf-8")
            return None
        return blob


#: Singleton, matching the reference's ``pr.assistant`` spelling.
assistant = Assistant()
