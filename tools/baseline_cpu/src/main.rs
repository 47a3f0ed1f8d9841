//! HELM-CPU baseline anchor: sustained gate-bootstraps/second of tfhe-rs
//! 0.4.1 boolean DEFAULT_PARAMETERS with rayon across all cores — exactly
//! the reference's hot loop (one `ServerKey::and/xor/...` call = one gate
//! bootstrap; reference src/gates.rs:255-271, fan-out src/circuit.rs:531,
//! keygen src/bin/helm.rs:241).
//!
//! Run:  cargo run --release            (defaults: 4096 gates, 3 rounds)
//!       GATES=8192 ROUNDS=5 cargo run --release
//!
//! Prints single-thread latency, all-core throughput, and the implied
//! bootstraps/s — the number BASELINE.md's anchor should be replaced with
//! when this is run on the comparison host.

use rayon::prelude::*;
use std::time::Instant;
use tfhe::boolean::prelude::*;

fn main() {
    let gates: usize = std::env::var("GATES")
        .ok()
        .and_then(|v| v.parse().ok())
        .unwrap_or(4096);
    let rounds: usize = std::env::var("ROUNDS")
        .ok()
        .and_then(|v| v.parse().ok())
        .unwrap_or(3);

    let (ck, sk) = gen_keys(); // DEFAULT_PARAMETERS, as bin/helm.rs:241
    let a: Vec<Ciphertext> = (0..gates).map(|i| ck.encrypt(i % 2 == 0)).collect();
    let b: Vec<Ciphertext> = (0..gates).map(|i| ck.encrypt(i % 3 == 0)).collect();

    // single-thread latency (median of 32)
    let t0 = Instant::now();
    for i in 0..32 {
        let _ = sk.and(&a[i], &b[i]);
    }
    let st_ms = t0.elapsed().as_secs_f64() * 1000.0 / 32.0;
    println!("single-thread gate bootstrap: {st_ms:.2} ms ({:.1}/s)", 1000.0 / st_ms);

    // all-core sustained throughput (the reference's per-level shape)
    let mut best = 0.0f64;
    for r in 0..rounds {
        let t0 = Instant::now();
        let out: Vec<Ciphertext> = a
            .par_iter()
            .zip(b.par_iter())
            .map(|(x, y)| sk.and(x, y))
            .collect();
        let dt = t0.elapsed().as_secs_f64();
        let rate = gates as f64 / dt;
        best = best.max(rate);
        println!(
            "round {r}: {gates} bootstraps in {dt:.2}s = {rate:.0} bs/s ({} cores)",
            rayon::current_num_threads()
        );
        std::hint::black_box(&out);
        // correctness spot check
        assert_eq!(ck.decrypt(&out[0]), ck.decrypt(&a[0]) && ck.decrypt(&b[0]));
    }
    println!("ANCHOR gate_bootstraps_per_sec_cpu_host: {best:.0}");
}
