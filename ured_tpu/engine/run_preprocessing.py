"""Reference-named CLI alias: ``python -m ured_tpu.engine.run_preprocessing`` runs
the same entry point as ``python -m ured_tpu.data.preprocessing`` (the reference user's
command surface, reference ``engine/run_preprocessing.py``)."""

from ured_tpu.data.preprocessing import main  # noqa: F401

if __name__ == "__main__":
    import sys

    main(sys.argv)
