"""Display-option manager — reference ``pr.options``
(``/root/reference/pyranges1/core/options.py:5-123``).

Same public surface and defaults: ``set_option`` / ``get_option`` /
``reset_options`` / ``display_options`` over the five display knobs. The
consumers differ by engine: here the options drive ``tostring.py``'s
lazily-bounded table repr (a ``take(n+1)`` job, never a full scan) instead
of a pandas repr.
"""

from __future__ import annotations

# name -> (default, description); order is the display order.
_KNOWN: tuple = (
    ("max_rows_to_show", 8, "the max number of rows to show in PyRanges repr"),
    (
        "max_column_names_to_show",
        3,
        "how many columns listed in PyRanges repr when not all fit the screen width",
    ),
    (
        "console_width",
        None,
        "console width, affecting PyRanges representation (None for auto)",
    ),
    (
        "html_max_cols",
        20,
        "max number of columns to show as HTML (e.g. Jupyter), others are hidden",
    ),
    (
        "html_max_rows",
        None,
        "max n. of rows shown as HTML (e.g. Jupyter). If undefined, max_rows_to_show is used",
    ),
)


class Options:
    """Mutable option store with reference-identical accessor semantics."""

    def __init__(self) -> None:
        self._values = {name: default for name, default, _ in _KNOWN}
        self._desc = {name: desc for name, _, desc in _KNOWN}

    def _check(self, name: str) -> None:
        if name not in self._values:
            raise ValueError(f"Option {name} not recognized.")

    def set_option(self, name: str, value) -> None:
        """Set ``name`` to ``value``; unknown names raise ValueError."""
        self._check(name)
        self._values[name] = value

    def get_option(self, name: str):
        """Current value of ``name``; unknown names raise ValueError."""
        self._check(name)
        return self._values[name]

    def reset_options(self) -> None:
        """Restore every option to its default."""
        self._values = {name: default for name, default, _ in _KNOWN}

    def display_options(self) -> str:
        """One aligned ``name : value (description)`` line per option."""
        wk = max(len(n) for n in self._values)
        wv = max(len(str(v)) for v in self._values.values())
        return "\n".join(
            f"{n:<{wk}} : {self._values[n]!s:>{wv}} ({self._desc[n]})"
            for n in self._values
        )

    def __repr__(self) -> str:
        return self.display_options()


#: The singleton the package exports as ``pr.options``.
options = Options()
