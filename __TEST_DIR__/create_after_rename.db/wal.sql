create table tbl (i integer);;
insert into tbl VALUES (5);;
create table tbl (i integer);;
insert into tbl VALUES (5);;
