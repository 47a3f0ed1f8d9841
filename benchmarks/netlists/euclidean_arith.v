// squared Euclidean distance, n=4 (the euclidean family of RUNNING.md):
// dist = sum (a_i - b_i)^2, behavioral arithmetic in processed form
module euclidean(a0, a1, a2, a3, b0, b1, b2, b3, dist);
  input [31:0] a0, a1, a2, a3, b0, b1, b2, b3;
  output [31:0] dist;
  wire d0, d1, d2, d3, q0, q1, q2, q3, s1, s2;

  sub u0(a0, b0, d0);
  sub u1(a1, b1, d1);
  sub u2(a2, b2, d2);
  sub u3(a3, b3, d3);
  mult m0(d0, d0, q0);
  mult m1(d1, d1, q1);
  mult m2(d2, d2, q2);
  mult m3(d3, d3, q3);
  add s0(q0, q1, s1);
  add s0b(q2, q3, s2);
  add s0c(s1, s2, dist);
endmodule
