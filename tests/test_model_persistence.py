"""save/load roundtrips for every model facade (GP already covered in
test_api.py): GPClassifier (binary + multiclass, non-numeric labels),
SVGP (incl. bernoulli label set), MultiOutputGP (LMC)."""

import numpy as np
import pytest

from cugp_tpu import api
from cugp_tpu.data import synthetic


def test_gpclassifier_roundtrip_binary(tmp_path):
    X, y = synthetic.two_moons(n=80, seed=0)
    labels = np.where(y > 0, "pos", "neg")
    clf = api.GPClassifier()
    clf.fit(X, labels, steps=10, learning_rate=0.1)
    p0 = np.asarray(clf.predict_proba(X[:10]))
    clf.save(str(tmp_path / "ck"))
    clf2 = api.GPClassifier.load(str(tmp_path / "ck"))
    p1 = np.asarray(clf2.predict_proba(X[:10]))
    np.testing.assert_array_equal(p0, p1)
    assert list(clf2.classes_) == ["neg", "pos"]
    assert set(np.asarray(clf2.predict(X[:10]))) <= {"neg", "pos"}


@pytest.mark.deep
def test_gpclassifier_roundtrip_multiclass(tmp_path):
    X, y = synthetic.gaussian_blobs(n=60, num_classes=3, seed=2)
    clf = api.GPClassifier()
    clf.fit(X, y, steps=8, learning_rate=0.1, num_newton=10)
    p0 = np.asarray(clf.predict_proba(X[:8]))
    clf.save(str(tmp_path / "ck"))
    clf2 = api.GPClassifier.load(str(tmp_path / "ck"))
    p1 = np.asarray(clf2.predict_proba(X[:8]))
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_array_equal(np.asarray(clf2.predict(X[:8])),
                                  np.asarray(clf.predict(X[:8])))


@pytest.mark.deep
def test_svgp_roundtrip_bernoulli(tmp_path):
    X, y = synthetic.two_moons(n=120, seed=1)
    model = api.SVGP(likelihood="bernoulli")
    model.fit(X, y, num_inducing=16, steps=40, batch=60,
              learning_rate=0.05)
    p0 = np.asarray(model.predict_proba(X[:12]))
    model.save(str(tmp_path / "ck"))
    m2 = api.SVGP.load(str(tmp_path / "ck"))
    p1 = np.asarray(m2.predict_proba(X[:12]))
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_array_equal(np.asarray(m2.predict(X[:12])),
                                  np.asarray(model.predict(X[:12])))


@pytest.mark.deep
def test_svgp_roundtrip_gaussian(tmp_path):
    X, y, _ = synthetic.sinusoid_1d(n=150, seed=4)
    model = api.SVGP()
    model.fit(X, y, num_inducing=16, steps=40, batch=64)
    mu0, var0 = model.predict(X[:9])
    model.save(str(tmp_path / "ck"))
    m2 = api.SVGP.load(str(tmp_path / "ck"))
    mu1, var1 = m2.predict(X[:9])
    np.testing.assert_array_equal(np.asarray(mu0), np.asarray(mu1))
    np.testing.assert_array_equal(np.asarray(var0), np.asarray(var1))


def test_multioutput_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(-2, 2, 60))[:, None].astype(np.float32)
    f = np.sin(2.0 * X[:, 0])
    Y = np.stack([f, 0.5 * f + 0.1 * rng.standard_normal(60)],
                 axis=1).astype(np.float32)
    model = api.MultiOutputGP(rank=1)
    model.fit(X, Y, steps=15, learning_rate=0.1)
    mu0, var0 = model.predict(X[:7])
    model.save(str(tmp_path / "ck"))
    m2 = api.MultiOutputGP.load(str(tmp_path / "ck"))
    mu1, var1 = m2.predict(X[:7])
    np.testing.assert_array_equal(np.asarray(mu0), np.asarray(mu1))
    np.testing.assert_array_equal(np.asarray(var0), np.asarray(var1))
    assert m2.rank == 1


def test_load_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        api.GPClassifier.load(str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        api.SVGP.load(str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        api.MultiOutputGP.load(str(tmp_path / "nope"))
