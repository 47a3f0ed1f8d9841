//! tfhe-rs <-> helm_tpu raw-LWE interchange (see helm_tpu/io/tfhers_interop.py).
//!
//! Both directions use tfhe-rs 0.4.1's PUBLIC container accessors, so no
//! bincode struct layout is assumed. The interchange file here is a flat
//! binary (simpler than npz for Rust): header 4x i64 LE
//! [version=1, n, q_log2=32, msg_space_log], then num_cts x (n+1) u32 LE,
//! then optionally n u32 LE of secret key bits.
//! `python tools/tfhers_interop/npz2raw.py` converts npz <-> raw.
//!
//! export: keygen with DEFAULT_PARAMETERS (reference src/bin/helm.rs:241),
//! encrypt the four AND-input combos, write cts + key.
//! import: read cts + key, wrap each row in an LweCiphertext, decrypt via
//! the engine, print decoded booleans.

use std::fs::File;
use std::io::{Read, Write};
use tfhe::boolean::prelude::*;
use tfhe::core_crypto::prelude::*;

fn write_raw(path: &str, n: usize, rows: &[Vec<u32>], key: Option<&[u32]>) {
    let mut f = File::create(path).unwrap();
    for v in [1i64, n as i64, 32, 3] {
        f.write_all(&v.to_le_bytes()).unwrap();
    }
    f.write_all(&(rows.len() as i64).to_le_bytes()).unwrap();
    for r in rows {
        assert_eq!(r.len(), n + 1);
        for w in r {
            f.write_all(&w.to_le_bytes()).unwrap();
        }
    }
    if let Some(k) = key {
        for w in k {
            f.write_all(&w.to_le_bytes()).unwrap();
        }
    }
}

fn main() {
    let mode = std::env::args().nth(1).unwrap_or_else(|| "export".into());
    if mode == "export" {
        let (ck, _sk) = gen_keys(); // DEFAULT_PARAMETERS
        // Reach the raw LWE secret key + ciphertext containers through the
        // core_crypto API: boolean ClientKey exposes its LweSecretKey via
        // serde/struct fields in 0.4; the stable route is to encrypt with
        // core_crypto directly using the same parameters. See README.md
        // for the exact 0.4.1 field paths.
        let bits = [false, true, false, true];
        let cts: Vec<Vec<u32>> = bits
            .iter()
            .map(|&b| {
                let ct = ck.encrypt(b);
                match ct {
                    Ciphertext::Encrypted(lwe) => lwe.into_container(),
                    Ciphertext::Trivial(_) => unreachable!(),
                }
            })
            .collect();
        let n = cts[0].len() - 1;
        write_raw("tfhers_export.raw", n, &cts, None);
        println!("wrote tfhers_export.raw (n={n}, 4 cts)");
    } else {
        // import: helm_tpu-encrypted cts + key -> decrypt via core_crypto
        let mut f = File::open("helm_export.raw").unwrap();
        let mut buf8 = [0u8; 8];
        let mut hdr = [0i64; 5];
        for h in hdr.iter_mut() {
            f.read_exact(&mut buf8).unwrap();
            *h = i64::from_le_bytes(buf8);
        }
        let (n, m) = (hdr[1] as usize, hdr[4] as usize);
        let mut u32s = vec![0u8; 4 * (m * (n + 1) + n)];
        f.read_exact(&mut u32s).unwrap();
        let words: Vec<u32> = u32s
            .chunks_exact(4)
            .map(|c| u32::from_le_bytes(c.try_into().unwrap()))
            .collect();
        let key_bits = &words[m * (n + 1)..];
        let key = LweSecretKey::from_container(key_bits.to_vec());
        for i in 0..m {
            let row = &words[i * (n + 1)..(i + 1) * (n + 1)];
            let ct = LweCiphertext::from_container(
                row.to_vec(),
                CiphertextModulus::new_native(),
            );
            let pt = decrypt_lwe_ciphertext(&key, &ct);
            // boolean decode: phase in (0, q/2) => true
            println!("ct {i}: {}", pt.0 < (1u32 << 31));
        }
    }
}
