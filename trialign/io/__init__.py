from trialign.io.datasets import load_dat_sequence, load_reference_triplet, read_fasta  # noqa: F401
