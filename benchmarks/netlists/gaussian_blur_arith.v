// 3x3 gaussian blur, kernel [1 2 1; 2 4 2; 1 2 1]/16, over a 3x4 pixel
// tile (the blur family of RUNNING.md), behavioral arithmetic in HELM
// processed form. Two output pixels (window centers (1,1) and (1,2)).
module gaussian_blur(p00, p01, p02, p03, p10, p11, p12, p13, p20, p21, p22, p23, g1, g2);
  input [31:0] p00, p01, p02, p03, p10, p11, p12, p13, p20, p21, p22, p23;
  output [31:0] g1, g2;
  wire c1a, c1b, c1, e1a, e1b, e1, e1s, m1s, t1a, t1;
  wire c2a, c2b, c2, e2a, e2b, e2, e2s, m2s, t2a, t2;

  add a10(p00, p02, c1a);
  add a11(p20, p22, c1b);
  add a12(c1a, c1b, c1);
  add a13(p01, p10, e1a);
  add a14(p12, p21, e1b);
  add a15(e1a, e1b, e1);
  shl s10(e1, 1, e1s);
  shl s11(p11, 2, m1s);
  add a16(c1, e1s, t1a);
  add a17(t1a, m1s, t1);
  shr s12(t1, 4, g1);

  add a20(p01, p03, c2a);
  add a21(p21, p23, c2b);
  add a22(c2a, c2b, c2);
  add a23(p02, p11, e2a);
  add a24(p13, p22, e2b);
  add a25(e2a, e2b, e2);
  shl s20(e2, 1, e2s);
  shl s21(p12, 2, m2s);
  add a26(c2, e2s, t2a);
  add a27(t2a, m2s, t2);
  shr s22(t2, 4, g2);
endmodule
