"""UMAP (McInnes, Healy & Melville 2018) implemented from scratch, JAX layout.

umap-learn is not installable in this environment, but the reference's
latent analyses use UMAP projections everywhere
(reference src/utils/util_latent_analysis.py:45-64,
src/training/pso_analysis.py, pso_inverter_analysis.py). This module
implements the published algorithm directly:

1. exact kNN via one broadcasted pairwise-distance matmul on the host
   (the analysis datasets are at most a few thousand particles — one
   NumPy GEMM beats any index structure at that size);
2. smooth-kNN calibration: per-point rho_i (distance to nearest nonzero
   neighbor) and sigma_i solved by bisection so that
   sum_j exp(-(max(0, d_ij − rho_i)) / sigma_i) = log2(k);
3. fuzzy simplicial set: w_ij memberships symmetrized by probabilistic
   t-conorm W + Wᵀ − W∘Wᵀ;
4. (a, b) curve parameters fitted to the min_dist/spread target curve;
5. the cross-entropy layout optimized by per-epoch edge sampling with
   negative sampling — vectorized over ALL edges as one jitted
   `lax.scan` body (Bernoulli(w/w_max) edge activation has the same
   expected sampling rate as umap-learn's epochs_per_sample schedule)
   instead of umap-learn's sequential numba loop.

`transform(new)` embeds out-of-sample points at the membership-weighted
mean of their kNN's embeddings followed by a short refinement (attraction
plus negative-sampling repulsion against the FROZEN reference embedding,
like umap-learn's transform) —
the same construction umap-learn uses for its transform initialization.

This is a clean-room implementation from the paper; results are a genuine
UMAP embedding but are not expected to be bitwise-equal to umap-learn.
"""

from __future__ import annotations

import numpy as np


def _pairwise_dists(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # single source of truth for the broadcasted Euclidean kernel lives in
    # analysis/latent.py (lazy import: latent.py lazily imports this module)
    from gan_discovery_pso_tpu.analysis.latent import mutual_distance

    return mutual_distance(a, b).reshape(len(a), len(b))


def _knn(x: np.ndarray, k: int, exclude_self: bool = True):
    """Exact kNN: (indices [N,k], distances [N,k]) sorted ascending."""
    d = _pairwise_dists(x, x)
    if exclude_self:
        np.fill_diagonal(d, np.inf)
    idx = np.argsort(d, axis=1)[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


def _smooth_knn(dists: np.ndarray, k: int, n_iter: int = 64):
    """Per-point (rho, sigma): rho = nearest nonzero-neighbor distance,
    sigma solved by bisection for sum_j exp(-(d_j − rho)^+ / sigma) = log2(k)."""
    n = dists.shape[0]
    # nearest strictly-positive distance (duplicated points give d=0 in
    # leading columns — take the row MINIMUM over the masked matrix, not
    # column 0); rows with no positive neighbor at all get rho=0
    pos = np.where(dists > 0, dists, np.inf)
    rho = pos.min(axis=1)
    rho[~np.isfinite(rho)] = 0.0
    target = np.log2(k)

    adj = np.maximum(dists - rho[:, None], 0.0)
    lo = np.zeros(n)
    hi = np.full(n, np.inf)
    sigma = np.ones(n)
    for _ in range(n_iter):
        psum = np.exp(-adj / sigma[:, None]).sum(axis=1)
        too_big = psum > target
        hi = np.where(too_big, sigma, hi)
        lo = np.where(too_big, lo, sigma)
        sigma = np.where(np.isfinite(hi), (lo + hi) / 2.0, sigma * 2.0)
    # umap-learn's MIN_K_DIST_SCALE floor keeps sigma away from 0
    mean_d = dists.mean() if dists.size else 1.0
    sigma = np.maximum(sigma, 1e-3 * mean_d)
    return rho, sigma


def _memberships(dists: np.ndarray, rho: np.ndarray, sigma: np.ndarray):
    return np.exp(-np.maximum(dists - rho[:, None], 0.0) / sigma[:, None])


def find_ab_params(spread: float = 1.0, min_dist: float = 0.1):
    """Fit 1/(1 + a·d^(2b)) to the piecewise target curve (paper §3.2)."""
    from scipy.optimize import curve_fit

    xv = np.linspace(0.0, spread * 3.0, 300)
    yv = np.where(xv < min_dist, 1.0, np.exp(-(xv - min_dist) / spread))
    (a, b), _ = curve_fit(lambda x, a, b: 1.0 / (1.0 + a * x ** (2.0 * b)), xv, yv)
    return float(a), float(b)


def _spectral_init(n: int, edges, n_components: int) -> np.ndarray | None:
    """Spectral embedding of the symmetrized fuzzy graph: eigenvectors
    2..n_components+1 (smallest eigenvalues, skipping the constant one) of
    the symmetric-normalized Laplacian I − D^-1/2 W D^-1/2 — umap-learn's
    default layout initialization (umap/spectral.py spectral_layout, what
    the reference's util_latent_analysis.py:45-64 delegates to).

    Returns None when the construction is degenerate — disconnected graph
    (eigenvalue 0 has multiplicity > 1 and the eigenvectors are component
    indicators, where umap-learn switches to its multi-component meta
    embedding), too few points for eigsh, or no ARPACK convergence — and
    the caller falls back to PCA init."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components
    from scipy.sparse.linalg import ArpackError, ArpackNoConvergence, eigsh

    heads, tails, weights = edges
    k = n_components + 1
    if n <= k + 1:
        return None
    g = sp.coo_matrix((weights, (heads, tails)), shape=(n, n)).tocsr()
    ncc, _ = connected_components(g, directed=False)
    if ncc > 1:
        return None
    deg = np.asarray(g.sum(axis=1)).ravel()
    dinv = sp.diags(1.0 / np.sqrt(np.maximum(deg, 1e-12)))
    lap = sp.identity(n, format="csr") - dinv @ g @ dinv
    try:
        vals, vecs = eigsh(
            lap, k, which="SM", v0=np.ones(n),
            ncv=min(n, max(2 * k + 1, int(np.sqrt(n)))),
            tol=1e-4, maxiter=n * 5,
        )
    except (ArpackError, ArpackNoConvergence):
        return None
    order = np.argsort(vals)
    return np.asarray(vecs[:, order[1:k]], np.float64)


_LAYOUT_CACHE: dict = {}


def _layout_fn(n_epochs: int, neg: int, move_tail: bool, has_ref: bool):
    """One jitted layout program per (n_epochs, neg, move_tail, has_ref):
    everything else — embedding, edges, probs, (a, b, lr), PRNG key — enters
    as an argument, so repeated fits at the same (padded) shapes reuse ONE
    compiled executable instead of re-jitting a fresh closure per call."""
    cache_key = (n_epochs, neg, move_tail, has_ref)
    if cache_key in _LAYOUT_CACHE:
        return _LAYOUT_CACHE[cache_key]

    import jax
    import jax.numpy as jnp

    def clip4(g):
        return jnp.clip(g, -4.0, 4.0)

    @jax.jit
    def run(y0, ref, heads, tails, probs, abl, key):
        a, b, lr0 = abl[0], abl[1], abl[2]
        e = heads.shape[0]
        n_ref = ref.shape[0]

        def epoch(y, ep):
            k1, k2 = jax.random.split(jax.random.fold_in(key, ep))
            alpha = lr0 * (1.0 - ep / n_epochs)
            active = jax.random.uniform(k1, (e,)) < probs  # Bernoulli(w/w_max)

            yh = y[heads]
            yt = ref[tails] if has_ref else y[tails]
            diff = yh - yt
            d2 = jnp.sum(diff * diff, axis=1)
            att = (-2.0 * a * b * d2 ** (b - 1.0)) / (a * d2 ** b + 1.0)
            att = jnp.where(d2 > 0, att, 0.0)
            g_att = clip4(att[:, None] * diff) * active[:, None]
            y = y.at[heads].add(alpha * g_att)
            if move_tail and not has_ref:
                y = y.at[tails].add(-alpha * g_att)

            # negative sampling: `neg` uniform repulsors per active edge
            nidx = jax.random.randint(k2, (e, neg), 0, n_ref)
            yn = ref[nidx] if has_ref else y[nidx]
            diffn = y[heads][:, None, :] - yn  # [E, neg, dim]
            d2n = jnp.sum(diffn * diffn, axis=2)
            rep = (2.0 * b) / ((0.001 + d2n) * (a * d2n ** b + 1.0))
            g_rep = clip4(rep[:, :, None] * diffn) * active[:, None, None]
            y = y.at[heads].add(alpha * jnp.sum(g_rep, axis=1))
            return y, None

        return jax.lax.scan(epoch, y0, jnp.arange(n_epochs))[0]

    _LAYOUT_CACHE[cache_key] = run
    return run


class UMAP:
    """Drop-in subset of umap-learn's API: fit / fit_transform / transform."""

    def __init__(
        self,
        n_components: int = 2,
        n_neighbors: int = 15,
        min_dist: float = 0.1,
        spread: float = 1.0,
        n_epochs: int = 200,
        learning_rate: float = 1.0,
        negative_sample_rate: int = 5,
        random_state: int = 42,
        init: str = "pca",
    ):
        self.n_components = n_components
        self.n_neighbors = n_neighbors
        self.min_dist = min_dist
        self.spread = spread
        self.n_epochs = n_epochs
        self.learning_rate = learning_rate
        self.negative_sample_rate = negative_sample_rate
        self.random_state = random_state
        if init not in ("pca", "spectral"):
            raise ValueError(f"init must be 'pca' or 'spectral', not {init!r}")
        # "spectral" = umap-learn's default (normalized fuzzy-graph Laplacian
        # eigenvectors, layout-comparable to reference output); "pca" is the
        # deterministic default here and the fallback for degenerate graphs
        self.init = init

    # -- graph ---------------------------------------------------------------

    def _build_graph(self, x: np.ndarray):
        k = min(self.n_neighbors, len(x) - 1)
        idx, dists = _knn(x, k)
        rho, sigma = _smooth_knn(dists, k)
        w = _memberships(dists, rho, sigma)  # [N, k]
        n = len(x)
        dense = np.zeros((n, n), np.float64)
        rows = np.repeat(np.arange(n), k)
        dense[rows, idx.ravel()] = w.ravel()
        sym = dense + dense.T - dense * dense.T  # fuzzy set union
        heads, tails = np.nonzero(sym)
        weights = sym[heads, tails]
        return (idx, rho, sigma), (heads, tails, weights)

    # -- layout --------------------------------------------------------------

    def _optimize(self, init: np.ndarray, edges, n_epochs: int, key_seed: int,
                  move_tail: bool = True,
                  fixed_ref: np.ndarray | None = None):
        """Vectorized SGD layout as one jitted lax.scan over epochs.

        move_tail=False + fixed_ref implements transform(): tails index a
        frozen reference embedding; only heads (the new points) move."""
        import jax
        import jax.numpy as jnp

        heads, tails, weights = edges
        e = len(heads)
        if e == 0 or n_epochs == 0:
            return np.asarray(init, np.float32)
        a, b = find_ab_params(self.spread, self.min_dist)
        probs_np = np.asarray(weights / weights.max(), np.float64)
        # pad the edge axis to a power-of-two bucket: the jitted scan is
        # shape-specialized, and per-iteration analysis calls (e.g.
        # pipelines.run_pso_analysis's umap_space_{i}.png loop) present a
        # slightly different edge count every call — padding with
        # never-active (prob=0) self-edges lets ONE compiled layout program
        # serve the whole sweep instead of recompiling per iteration
        e_pad = max(256, 1 << (e - 1).bit_length())
        if e_pad != e:
            pad = e_pad - e
            heads = np.concatenate([np.asarray(heads), np.zeros(pad, np.int64)])
            tails = np.concatenate([np.asarray(tails), np.zeros(pad, np.int64)])
            probs_np = np.concatenate([probs_np, np.zeros(pad)])
            e = e_pad
        y0 = jnp.asarray(init, jnp.float32)
        ref = y0 if fixed_ref is None else jnp.asarray(fixed_ref, jnp.float32)
        run = _layout_fn(
            int(n_epochs), int(self.negative_sample_rate),
            bool(move_tail), fixed_ref is not None,
        )
        return np.asarray(run(
            y0,
            ref,
            jnp.asarray(heads, jnp.int32),
            jnp.asarray(tails, jnp.int32),
            jnp.asarray(probs_np, jnp.float32),
            jnp.asarray([a, b, self.learning_rate], jnp.float32),
            jax.random.key(key_seed),
        ))

    # -- public api ----------------------------------------------------------

    def fit(self, x: np.ndarray):
        x = np.asarray(x, np.float64)
        self._x = x
        if len(x) < 2:  # degenerate input: trivial embedding, no graph
            self.embedding_ = np.zeros((len(x), self.n_components), np.float32)
            self._knn_idx = np.zeros((len(x), 0), np.int64)
            self._rho = np.zeros(len(x))
            self._sigma = np.ones(len(x))
            return self
        (idx, rho, sigma), edges = self._build_graph(x)
        self._knn_idx, self._rho, self._sigma = idx, rho, sigma
        init = None
        if self.init == "spectral":
            init = _spectral_init(len(x), edges, self.n_components)
        if init is None:
            # deterministic PCA init (the default; also the fallback for
            # degenerate spectral graphs); umap-learn scales its spectral
            # init to max-abs 10 the same way
            from sklearn.decomposition import PCA

            ncomp = min(self.n_components, x.shape[1], max(1, len(x) - 1))
            init = PCA(
                n_components=ncomp, random_state=self.random_state
            ).fit_transform(x)
        if init.shape[1] < self.n_components:
            pad = np.zeros((len(x), self.n_components - init.shape[1]))
            init = np.hstack([init, pad])
        scale = np.abs(init).max() or 1.0
        init = init / scale * 10.0
        init = init + np.random.RandomState(self.random_state).normal(
            0, 1e-4, init.shape
        )
        self.embedding_ = self._optimize(
            init, edges, self.n_epochs, self.random_state
        )
        return self

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        return self.fit(x).embedding_

    def transform(self, xnew: np.ndarray) -> np.ndarray:
        """Out-of-sample embedding: kNN against the training set, smooth-kNN
        memberships, init at the membership-weighted mean of neighbor
        embeddings, short attract-only refinement against the frozen
        training embedding."""
        xnew = np.asarray(xnew, np.float64)
        k = min(self.n_neighbors, len(self._x))
        d = _pairwise_dists(xnew, self._x)
        idx = np.argsort(d, axis=1)[:, :k]
        nd = np.take_along_axis(d, idx, axis=1)
        rho, sigma = _smooth_knn(nd, k)
        w = _memberships(nd, rho, sigma)
        w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
        init = np.einsum("nk,nkc->nc", w, self.embedding_[idx])

        heads = np.repeat(np.arange(len(xnew)), k)
        tails = idx.ravel()
        weights = w.ravel()
        good = weights > 0
        refined = self._optimize(
            init, (heads[good], tails[good], weights[good]),
            n_epochs=30, key_seed=self.random_state + 1,
            move_tail=False, fixed_ref=self.embedding_,
        )
        return refined
