// 2x2 matrix multiply (the mmult family of RUNNING.md), processed arith form
module mmult2(a00, a01, a10, a11, b00, b01, b10, b11, c00, c01, c10, c11);
  input [31:0] a00, a01, a10, a11, b00, b01, b10, b11;
  output [31:0] c00, c01, c10, c11;
  wire t1, t2, t3, t4, t5, t6, t7, t8;

  mult m1(a00, b00, t1);
  mult m2(a01, b10, t2);
  add a1(t1, t2, c00);
  mult m3(a00, b01, t3);
  mult m4(a01, b11, t4);
  add a2(t3, t4, c01);
  mult m5(a10, b00, t5);
  mult m6(a11, b10, t6);
  add a3(t5, t6, c10);
  mult m7(a10, b01, t7);
  mult m8(a11, b11, t8);
  add a4(t7, t8, c11);
endmodule
