"""Shared console-script factory for the package's entry points.

Every CLI in the package exposes ``main(argv)`` (argv[0] = program name,
mirroring the reference's ``python engine/train.py cfg.json`` surface,
reference ``engine/train.py:361-368``); pyproject's ``[project.scripts]``
needs a zero-argument callable.  ``make_cli`` bridges the two once instead
of a copy-pasted wrapper per module.
"""

import sys


def make_cli(main):
    """Wrap ``main(argv)`` as a zero-arg console-script entry point."""

    def cli():
        return main(sys.argv)

    cli.__doc__ = f"Console-script entry point for ``{main.__module__}``."
    return cli
