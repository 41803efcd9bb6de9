"""Reference-named CLI alias: ``python -m ured_tpu.engine.generate_combined_h5`` runs
the same entry point as ``python -m ured_tpu.data.splits`` (the reference user's
command surface, reference ``engine/generate_combined_h5.py``)."""

from ured_tpu.data.splits import main  # noqa: F401

if __name__ == "__main__":
    import sys

    main(sys.argv)
