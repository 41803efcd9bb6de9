"""Reference-named CLI alias: ``python -m ured_tpu.engine.test`` runs
the same entry point as ``python -m ured_tpu.engine.evaluate`` (the reference user's
command surface, reference ``engine/test.py``)."""

from ured_tpu.engine.evaluate import main  # noqa: F401

if __name__ == "__main__":
    import sys

    main(sys.argv)
