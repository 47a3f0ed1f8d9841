// 3x1 box blur over a 6-pixel row (the blur family of RUNNING.md),
// behavioral arithmetic in HELM processed form: out[i] = (p[i-1]+p[i]+p[i+1])/3
module box_blur(p0, p1, p2, p3, p4, p5, b1, b2, b3, b4);
  input [31:0] p0, p1, p2, p3, p4, p5;
  output [31:0] b1, b2, b3, b4;
  wire s1a, s1, s2a, s2, s3a, s3, s4a, s4;

  add a0(p0, p1, s1a);
  add a1(s1a, p2, s1);
  div d1(s1, 3, b1);
  add a2(p1, p2, s2a);
  add a3(s2a, p3, s2);
  div d2(s2, 3, b2);
  add a4(p2, p3, s3a);
  add a5(s3a, p4, s3);
  div d3(s3, 3, b3);
  add a6(p3, p4, s4a);
  add a7(s4a, p5, s4);
  div d4(s4, 3, b4);
endmodule
