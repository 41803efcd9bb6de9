"""Reference-named CLI alias: ``python -m ured_tpu.engine.simple_cl`` runs
the same entry point as ``python -m ured_tpu.data.clustering`` (the reference user's
command surface, reference ``engine/simple_cl.py``)."""

from ured_tpu.data.clustering import main  # noqa: F401

if __name__ == "__main__":
    import sys

    main(sys.argv)
