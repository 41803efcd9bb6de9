"""Reference-named CLI alias: ``python -m ured_tpu.engine.generate_pair`` runs
the same entry point as ``python -m ured_tpu.data.pairs`` (the reference user's
command surface, reference ``engine/generate_pair.py``)."""

from ured_tpu.data.pairs import main  # noqa: F401

if __name__ == "__main__":
    import sys

    main(sys.argv)
