"""Full learning loop: bin synthetic data, train, call, evaluate F1.

This is the framework's own end-to-end accuracy test (the reference has no
trained-model test; its demo relies on shipped checkpoints)."""

import os

import jax

import numpy as np

from clair3_rna_tpu.config import PileupConfig
from tests import simdata


def _write_truth(path, variants):
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
                "\tINFO\tFORMAT\tS\n")
        for v in variants["chr1"]:
            gt = "1/1" if v.genotype == (1, 1) else "0/1"
            f.write(f"chr1\t{v.pos + 1}\t.\t{v.ref}\t{v.alt}\t60\tPASS\t.\tGT\t{gt}\n")


def test_train_and_call_recovers_variants(tmp_path):
    from clair3_rna_tpu.train.data import build_training_bins, load_bins
    from clair3_rna_tpu.train.train import train_model
    from clair3_rna_tpu.caller.decode import CallConfig
    from clair3_rna_tpu.caller.pipeline import run_calling
    from clair3_rna_tpu.models.network import make_forward_fn
    from clair3_rna_tpu.models.params_io import load_params
    from clair3_rna_tpu.evaluation.compare_vcf import compare_vcf

    fasta, bam, genome, variants = simdata.make_dataset(
        tmp_path, seed=99, contig_len=30000, n_variants=60, depth=40)
    truth_path = str(tmp_path / "truth.vcf")
    _write_truth(truth_path, variants)

    bin_dir = str(tmp_path / "bins")
    cfg = PileupConfig(batch_size=256)
    n_shards, n_var, n_nonvar = build_training_bins(
        bam, fasta, truth_path, bin_dir, cfg=cfg,
        non_variant_keep_fraction=0.6, min_truth_support=2)
    assert n_shards >= 1 and n_var >= 30, (n_shards, n_var, n_nonvar)
    X, Y = load_bins(bin_dir)
    assert X.shape[1:] == (33, 18) and Y.shape[1] == 90
    assert np.all(Y.sum(axis=1) == 4)  # four one-hot heads

    weights_path = str(tmp_path / "model.npz")
    path, best_val = train_model(
        bin_dir, weights_path, add_indel_length=False, batch_size=128,
        max_epochs=12, patience=12, validation_fraction=0.15)
    assert os.path.exists(path)
    assert np.isfinite(best_val)

    params = load_params(path)
    _, forward = make_forward_fn(add_indel_length=False)
    out_path = str(tmp_path / "out.vcf")
    outputs, stats = run_calling(
        bam, fasta, out_path, cfg=cfg, call_cfg=CallConfig(show_ref=False),
        params=params, forward=forward, compress=False, progress=False)
    result = compare_vcf(outputs[0], truth_path, skip_genotyping=True)
    # overfit on its own training region: must recover most planted variants
    assert result.overall.f1 > 0.6, result.overall.row("overall")


def test_train_batch_larger_than_dataset_still_learns(tmp_path):
    """Regression: with batch_size > n_samples the loop used to drop the only
    (partial) batch every epoch and silently save the initial random weights."""
    import numpy as np
    from clair3_rna_tpu.models.network import init_params
    from clair3_rna_tpu.models.params_io import load_params
    from clair3_rna_tpu.train.train import train_model

    rng = np.random.RandomState(0)
    n = 60
    X = rng.randint(-20, 20, size=(n, 33, 18)).astype(np.int32)
    Y = np.zeros((n, 90), np.float32)
    Y[:, 0] = 1.0
    Y[:, 21] = 1.0
    Y[:, 24 + 16] = 1.0
    Y[:, 57 + 16] = 1.0
    bin_dir = tmp_path / "bins"
    bin_dir.mkdir()
    np.savez_compressed(
        bin_dir / "bin_00000.npz", position_matrix=X, label=Y,
        position=np.arange(n), alt_info=np.array(["5-"] * n))
    out = str(tmp_path / "w.npz")
    train_model(str(bin_dir), out, add_indel_length=False, batch_size=2000,
                max_epochs=2, use_mesh=False)
    trained = load_params(out)
    init = init_params(0, add_indel_length=False)
    leaves_t = jax.tree_util.tree_leaves(trained)
    leaves_i = jax.tree_util.tree_leaves(init)
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-7
               for a, b in zip(leaves_t, leaves_i)), \
        "weights unchanged from init: no training step ran"
